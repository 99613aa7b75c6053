"""SafeLife-TPU: the SafeLife RL-safety benchmark as batched JAX programs.

Quick map (see README.md for the full tour):

* :mod:`safelife_tpu.env` — the batched functional environment
  (``EnvConfig``, ``reset``/``step``, reward-shaping wrappers).
* :mod:`safelife_tpu.registry` — canonical named environments and a
  gym-like convenience wrapper (``make("safelife-append-still-v1")``).
* :mod:`safelife_tpu.game` — host-side interactive game API.
* :mod:`safelife_tpu.io` — level files, iterators, archive tooling.
* :mod:`safelife_tpu.procgen` — procedural level generation.
* :mod:`safelife_tpu.side_effects` — EMD side-effect scoring.
* :mod:`safelife_tpu.training` — PPO/DQN, env factory, checkpoints.
* :mod:`safelife_tpu.render` — terminal and RGB renderers.

Nothing heavyweight is imported here; import submodules as needed.
"""

__version__ = "1.0.0"
