"""Hand-written TPU kernels (Pallas) for the hot environment ops.

These replace the reference's C compute kernels
(``safelife/speedups_src/*.c``) on the device hot path; the XLA
formulations in :mod:`safelife_tpu.core` remain the portable fallback
(CPU tests, odd shapes) and the semantic reference.
"""

from .obs import (  # noqa: F401
    recenter_views_pallas,
    recenter_views_sharded,
    use_obs_kernel,
)
from .physics import (  # noqa: F401
    advance_pallas,
    fused_actions_advance,
    use_fused_physics,
)
