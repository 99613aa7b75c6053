"""Pallas TPU kernel for the observation recenter + exit projection.

The observation phase is the honest step's bottleneck: producing the
per-agent wrapped view (reference semantics: ``safelife_env.py:105-146``
+ ``helper_utils.py:42-75``) costs ~1.9 ms of the 2.2 ms step at batch
4096 under the XLA one-hot-matmul formulation (round-2 `get_obs_batch`),
because XLA emits the two one-hot contractions as low-utilization
convolutions and materializes full-board compare/select passes for the
exit projection — ~40x off the HBM roofline for the ~30 MB the phase
actually has to move.

This kernel produces the same views with **zero gathers and zero
matmuls**: the wrapped window

    view[r, c] = packed[(y1 + r) mod H, (x1 + c) mod W]

is a per-lane 2-D cyclic rotation, and a rotation by a *data-dependent*
per-lane amount decomposes into log2 steps of fixed-amount cyclic lane
rolls selected per lane by the shift's bits:

    for k in bits(y1):  v = where(bit_k(y1), roll(v, 2^k rows), v)

Boards ride the flat ``[lanes, H*W]`` layout of :mod:`.physics` (cells
on the TPU lane axis). Row rotations are clean ``2^k * W`` lane rolls;
column rotations are ``2^k`` lane rolls with the column-wrap fixup
select. H = W = 26 costs 5 row rolls + 10 column rolls on VMEM-resident
tiles. The exit perimeter projection (``helper_utils.py:64-75``) is a
one-hot select in the same VMEM pass.

The kernel emits rotated **packed int32 views** (board | goal-colors
<< 16, white goals removed); callers slice ``[:vh, :vw]`` and unpack
binary channels outside (both fuse into the consumer under XLA).
Bit-exact vs the XLA formulation (tests/test_pallas.py::TestObsKernel).
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import cells as C
from .physics import MAX_CELLS, _pick_block, _roll


def use_obs_kernel(board_shape, batch, view_shape):
    """Whether the Pallas recenter kernel handles this configuration.

    Unlike the physics kernel (a documented negative result, opt-in),
    this one is the production default on TPU: the XLA formulation loses
    by an order of magnitude here. ``SAFELIFE_TPU_OBS_KERNEL=0`` opts
    out (falls back to the one-hot-matmul path).
    """
    if os.environ.get("SAFELIFE_TPU_OBS_KERNEL", "1").lower() in (
            "0", "off", "false"):
        return False
    if jax.default_backend() != "tpu":
        return False
    h, w = board_shape
    vh, vw = view_shape
    # Views larger than the board tile it (rare, interactive-only);
    # keep that on the XLA path.
    if vh > h or vw > w or h * w > MAX_CELLS:
        return False
    n_dev = len(jax.devices())
    if n_dev > 1:
        # Sharded meshes (fleet or single-host multi-chip) route through
        # recenter_views_sharded (custom_partitioning over the lane
        # axis); every device's local lane block must satisfy the
        # kernel's 8-row tiling for any lane-axis size dividing the
        # device count.
        return batch % (8 * n_dev) == 0
    return batch % 8 == 0


def _rotate2d(v, colx, y1, x1, h, w):
    """Per-lane 2-D cyclic rotation: out[y, x] = in[(y+y1)%h, (x+x1)%w].

    ``y1``/``x1`` are [LB, 1] per-lane shifts in [0, h) / [0, w); the
    rotation applies their binary decomposition as conditional
    fixed-amount rolls (conditions broadcast along the cell axis).
    """
    # Row rotation: flat out[i] = in[(i + y1*w) mod hw] — row rolls are
    # exact cyclic shifts by multiples of w in the flat layout.
    for k in range((h - 1).bit_length()):
        cond = ((y1 >> k) & 1) == 1
        v = jnp.where(cond, _roll(v, -((1 << k) * w)), v)
    # Column rotation: out[y, x] = in[y, (x+s)%w] per bit amount s; the
    # flat roll by -s crosses row boundaries for the last s columns,
    # which instead need the value w earlier (same row, wrapped).
    for k in range((w - 1).bit_length()):
        s = 1 << k
        cond = ((x1 >> k) & 1) == 1
        rolled = jnp.where(colx < w - s, _roll(v, -s), _roll(v, w - s))
        v = jnp.where(cond, rolled, v)
    return v


def _obs_kernel(board_ref, goals_ref, cy_ref, cx_ref, el_ref, ev_ref,
                out_ref, *, h, w, vh, vw, n_exits, remove_white):
    hw = h * w
    lb = board_ref.shape[0]
    b = board_ref[:]
    g = goals_ref[:]
    gcol = g & C.RAINBOW_COLOR
    if remove_white:
        gcol = gcol * (gcol != C.RAINBOW_COLOR)
    packed = b | (gcol << 16)

    f = jax.lax.broadcasted_iota(jnp.int32, (lb, hw), 1)
    colx = f % w
    # This program's agent column, one-hot-reduced out of the [LB, A]
    # center block (a (LB, 1) block of a width-A array would violate
    # the lane-tile divisibility rule; a dynamic lane slice is slower).
    k = pl.program_id(1)
    asel = (jax.lax.broadcasted_iota(jnp.int32, cy_ref.shape, 1) == k)
    cy = jnp.sum(jnp.where(asel, cy_ref[:], 0), axis=1, keepdims=True)
    cx = jnp.sum(jnp.where(asel, cx_ref[:], 0), axis=1, keepdims=True)
    y1 = (cy - vh // 2) % h
    x1 = (cx - vw // 2) % w
    v = _rotate2d(packed, colx, y1, x1, h, w)

    # Exit perimeter projection, raster order (later exits win). The
    # projected position (jy, jx) lands inside [0,vh)x[0,vw), which in
    # the rotated layout is plain flat index jy*w + jx.
    for e in range(n_exits):
        ey = el_ref[:, 2 * e:2 * e + 1]
        ex = el_ref[:, 2 * e + 1:2 * e + 2]
        valid = ev_ref[:, e:e + 1] != 0
        val = jnp.sum(jnp.where(f == ey * w + ex, packed, 0),
                      axis=1, keepdims=True)
        jy = (ey - cy + h // 2) % h - h // 2
        jx = (ex - cx + w // 2) % w - w // 2
        jy = jnp.clip(jy + vh // 2, 0, vh - 1)
        jx = jnp.clip(jx + vw // 2, 0, vw - 1)
        v = jnp.where((f == jy * w + jx) & valid, val, v)

    if out_ref.shape[0] == 1:    # agent-major [1, LB, hw] tile
        out_ref[0] = v
    else:                        # batch-major [LB, 1, hw] tile (A == 1)
        out_ref[:, 0] = v


def recenter_views_pallas(board, goals, cy, cx, exit_locs, exit_valid,
                          *, view_shape, remove_white_goals=True,
                          interpret=False):
    """Batched packed observation views via the Pallas recenter kernel.

    Parameters
    ----------
    board, goals : int32[B, H, W]
    cy, cx : int32[B, A] — view centers (callers pre-mask invalid agents
        to 0, matching ``get_obs_batch``).
    exit_locs : int32[B, E, 2]; exit_valid : bool[B, E]
    view_shape : (vh, vw) with vh <= H, vw <= W.

    Returns int32[B, A, vh, vw] packed views (board | goal colors << 16),
    identical to ``get_obs_batch(..., output_channels=None)``.
    """
    bsz, h, w = board.shape
    a = cy.shape[1]
    vh, vw = view_shape
    hw = h * w
    e = exit_locs.shape[1]
    if e == 0:  # no exits in the pool: keep the kernel shape-regular
        exit_locs = jnp.zeros((bsz, 1, 2), jnp.int32)
        exit_valid = jnp.zeros((bsz, 1), bool)
        e = 1
    lb = _pick_block(bsz)
    kernel = functools.partial(
        _obs_kernel, h=h, w=w, vh=vh, vw=vw, n_exits=e,
        remove_white=bool(remove_white_goals))
    out = pl.pallas_call(
        kernel,
        grid=(bsz // lb, a),
        in_specs=[
            pl.BlockSpec((lb, hw), lambda i, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, hw), lambda i, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, a), lambda i, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, a), lambda i, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, 2 * e), lambda i, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, e), lambda i, k: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        # Single-agent (the lockstep benchmark shape): emit [B, 1, hw]
        # directly so no cross-batch transpose ever materializes. The
        # multi-agent grid emits agent-major [A, B, hw] (each program
        # writes one (agent, block) tile) and pays one transpose.
        out_specs=(pl.BlockSpec((lb, 1, hw), lambda i, k: (i, 0, 0),
                                memory_space=pltpu.VMEM)
                   if a == 1 else
                   pl.BlockSpec((1, lb, hw), lambda i, k: (k, i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct(
            (bsz, 1, hw) if a == 1 else (a, bsz, hw), jnp.int32),
        interpret=interpret,
    )(
        board.reshape(bsz, hw).astype(jnp.int32),
        goals.reshape(bsz, hw).astype(jnp.int32),
        cy.astype(jnp.int32),
        cx.astype(jnp.int32),
        exit_locs.reshape(bsz, 2 * e).astype(jnp.int32),
        exit_valid.astype(jnp.int32),
    )
    if a == 1:
        views = out.reshape(bsz, 1, h, w)
    else:
        views = out.reshape(a, bsz, h, w).transpose(1, 0, 2, 3)
    # The [:vh, :vw] slice fuses into the consumer (channel unpack or
    # the policy's input relayout).
    return views[..., :vh, :vw]


# ---------------------------------------------------------------------------
# SPMD form: lane-axis partitioning for sharded meshes.
#
# pallas_call has no built-in GSPMD partitioning rule, so under a
# lane-sharded mesh (fleet training: env lanes sharded over every device
# of every host) a bare kernel call would fail to lower or force
# full-operand replication. Every operand and the result of the recenter
# are lane-major (batch dim 0) and lanes are independent, so the correct
# rule is trivial: partition everything along the lane axis and run the
# kernel per-device on local lanes. ``jax.experimental.
# custom_partitioning`` declares exactly that; XLA inserts nothing (the
# operands already live lane-sharded) and each device's kernel sees its
# local block. Verified on a virtual 8-device mesh in
# tests/test_obs_kernel.py::test_sharded_matches_unsharded.


@functools.lru_cache(maxsize=None)
def _cp_recenter(view_shape, remove_white, interpret):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    # A plain positional closure (custom_partitioning binds the
    # signature and rejects leftover keyword arguments from a partial).
    def local(board, goals, cy, cx, exit_locs, exit_valid):
        return recenter_views_pallas(
            board, goals, cy, cx, exit_locs, exit_valid,
            view_shape=view_shape, remove_white_goals=remove_white,
            interpret=interpret)

    cp = custom_partitioning(local)

    def _lane_axis(info):
        spec = getattr(info.sharding, "spec", None)
        if spec is None:
            spec = PartitionSpec()
        return spec[0] if len(spec) else None

    def _shardings(mesh, ax, arg_infos):
        args = tuple(
            NamedSharding(
                mesh, PartitionSpec(ax, *([None] * (len(a.shape) - 1))))
            for a in arg_infos)
        out = NamedSharding(mesh, PartitionSpec(ax, None, None, None))
        return args, out

    def infer(mesh, arg_infos, result_infos):
        return _shardings(mesh, _lane_axis(arg_infos[0]), arg_infos)[1]

    def partition(mesh, arg_infos, result_infos):
        args, out = _shardings(mesh, _lane_axis(arg_infos[0]), arg_infos)
        return mesh, local, out, args

    cp.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        # Shardy propagation rule (einsum-like): only the lane factor
        # ``b`` is shared between operands and result, so lane-axis
        # sharding propagates and everything else stays unsharded.
        sharding_rule="b h w, b h w, b a, b a, b e t, b e -> b a i j")
    return cp


def recenter_views_sharded(board, goals, cy, cx, exit_locs, exit_valid,
                           *, view_shape, remove_white_goals=True,
                           interpret=False):
    """:func:`recenter_views_pallas` under a lane-axis partitioning rule.

    Same signature and bit-identical output; use from computations jitted
    over a multi-device mesh (the env step only routes here when
    ``len(jax.devices()) > 1`` — see ``use_obs_kernel``).
    """
    cp = _cp_recenter(tuple(view_shape), bool(remove_white_goals),
                      bool(interpret))
    return cp(board, goals, cy, cx, exit_locs, exit_valid)
