#!/usr/bin/env python
"""Run the REFERENCE torch PPO stack headless for learning-curve parity.

BASELINE.md's correctness north star asks for "PPO steps-to-reward parity
on append-still within seed variance" — which needs actual reference
learning curves to compare against. This driver runs the reference's own
training stack (/root/reference/training/ppo.py:184-219, torch, CPU)
end to end, writing episode logs to a data dir, without touching
/root/reference (the C extension builds out-of-tree to /tmp, same recipe
as tests/test_c_engine_parity.py).

The reference hard-imports three packages absent from this image — gym,
pyemd, wandb — none of whose behavior matters for a training run:
 * gym: only Env/Wrapper/spaces shells (safelife_env.py:13,
   env_wrappers.py:5, safelife_logger.py:538) — stubbed faithfully below.
 * pyemd: pyemd.emd is delegated to our exact-LP implementation
   (safelife_tpu.side_effects.emd_hat), which is tolerance-tested against
   the same contract the reference relies on.
 * wandb: never imported when config['_wandb'] is unset
   (training/logging_setup.py:76-83); no stub needed.

Usage:
  python scripts/ref_ppo_run.py DATA_DIR --steps 1e6 --seed 1 \
      [--env-type append-still] [--penalty 0.0] [--no-side-effects]
"""

import argparse
import glob
import os
import shutil
import subprocess
import sys
import textwrap

REF = "/root/reference"
BUILD = "/tmp/slref_build/lib"
STUBS = "/tmp/slref_stubs"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GYM_STUB = textwrap.dedent('''
    """Minimal gym shim: just enough API for the reference SafeLife stack
    (gym.Env, gym.Wrapper with attribute delegation, spaces.Discrete/Box,
    gym.register). No registry, no seeding plumbing."""


    class Env(object):
        # NB: no action_space/observation_space class attributes — they
        # would shadow Wrapper.__getattr__ delegation to the inner env.
        metadata = {}
        reward_range = (-float("inf"), float("inf"))

        @property
        def unwrapped(self):
            return self

        def close(self):
            pass


    class Wrapper(Env):
        def __init__(self, env=None):
            self.env = env

        def __getattr__(self, name):
            if name.startswith("_") or self.__dict__.get("env") is None:
                raise AttributeError(name)
            return getattr(self.env, name)

        @property
        def unwrapped(self):
            return self.env.unwrapped

        def step(self, action):
            return self.env.step(action)

        def reset(self, **kwargs):
            return self.env.reset(**kwargs)

        def render(self, *args, **kwargs):
            return self.env.render(*args, **kwargs)

        def close(self):
            return self.env.close()


    class Space(object):
        def __init__(self, shape=None, dtype=None):
            self.shape = shape
            self.dtype = dtype


    class _Spaces(object):
        class Discrete(Space):
            def __init__(self, n):
                Space.__init__(self, shape=(), dtype="int64")
                self.n = n

        class Box(Space):
            def __init__(self, low=None, high=None, shape=None, dtype=None):
                Space.__init__(self, shape=tuple(shape), dtype=dtype)
                self.low = low
                self.high = high


    spaces = _Spaces()


    def register(*args, **kwargs):
        pass
''')

PYEMD_STUB = textwrap.dedent('''
    """pyemd shim: exact-LP earth mover distance with extra-mass penalty,
    delegated to safelife_tpu.side_effects.emd_hat (same contract as
    pyemd.emd as used by the reference side_effects.py:57)."""
    from safelife_tpu.side_effects import emd_hat as _emd_hat


    def emd(first_histogram, second_histogram, distance_matrix,
            extra_mass_penalty=-1.0):
        if extra_mass_penalty < 0:
            extra_mass_penalty = float(distance_matrix.max())
        return float(_emd_hat(first_histogram, second_histogram,
                              distance_matrix,
                              extra_mass_penalty=extra_mass_penalty))
''')


def build_reference_ext():
    pkg = os.path.join(BUILD, "safelife")
    built = os.path.isdir(pkg) and any(
        f.endswith(".so") for f in os.listdir(pkg))
    if not built:
        r = subprocess.run(
            [sys.executable, "setup.py", "build_ext",
             "--build-lib", BUILD, "--build-temp", "/tmp/slref_build/tmp"],
            cwd=REF, capture_output=True, timeout=600)
        if r.returncode != 0:
            sys.stderr.write(r.stderr.decode())
            raise SystemExit("reference C extension build failed")
    for f in glob.glob(os.path.join(REF, "safelife", "*.py")):
        dst = os.path.join(pkg, os.path.basename(f))
        if not os.path.exists(dst):
            shutil.copy(f, dst)
    for asset in ("sprites.png",):
        dst = os.path.join(pkg, asset)
        if not os.path.exists(dst):
            shutil.copy(os.path.join(REF, "safelife", asset), dst)
    lv = os.path.join(pkg, "levels")
    if not os.path.exists(lv):
        shutil.copytree(os.path.join(REF, "safelife", "levels"), lv)


def write_stubs():
    gym_dir = os.path.join(STUBS, "gym")
    os.makedirs(gym_dir, exist_ok=True)
    with open(os.path.join(gym_dir, "__init__.py"), "w") as f:
        f.write(GYM_STUB)
    with open(os.path.join(STUBS, "pyemd.py"), "w") as f:
        f.write(PYEMD_STUB)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("data_dir")
    ap.add_argument("--steps", type=float, default=1e6)
    ap.add_argument("--seed", type=int, required=True)
    ap.add_argument("--env-type", default="append-still")
    ap.add_argument("--penalty", type=float, default=0.0)
    ap.add_argument("--algo", default="ppo", choices=("ppo", "dqn"))
    ap.add_argument("--no-side-effects", action="store_true", help=(
        "skip the episode-end side-effect scoring (logging only; does not"
        " affect rewards or learning). NB: trips a latent reference bug — "
        "safelife_logger.py:318-333 only binds `score` when side effects "
        "are present — so leave scoring on for real runs."))
    ap.add_argument("--torch-threads", type=int, default=2)
    args = ap.parse_args()

    build_reference_ext()
    write_stubs()
    # Stubs first (so the real-but-absent packages resolve), then the
    # built reference package, then the reference repo root (training/).
    sys.path[:0] = [STUBS, BUILD, REF, REPO]

    import numpy as np
    if not hasattr(np, "product"):   # removed in numpy 2; models.py:89 uses it
        np.product = np.prod
    import torch
    torch.set_num_threads(args.torch_threads)

    from safelife.random import set_rng
    from training import logging_setup, models
    from training.global_config import config
    from training.env_factory import build_environments

    if args.no_side_effects:
        from safelife.safelife_env import SafeLifeEnv
        SafeLifeEnv.should_calculate_side_effects = False

    # Skip trajectory videos: modern imageio loads sprites.png as (70,70,2)
    # LA (the 2019-era loader expanded to RGBA) which trips the C renderer,
    # and rendering 1000-frame mp4s on this box's single core would distort
    # wall time. Videos have no effect on training or episode logs.
    import safelife.safelife_logger as _sl
    _sl.render_file = lambda *a, **k: None

    data_dir = args.data_dir
    os.makedirs(data_dir, exist_ok=True)
    logging_setup.setup_logging(data_dir, debug=False)

    config["algo"] = args.algo
    config["env_type"] = args.env_type
    config["steps"] = args.steps
    config["seed"] = args.seed
    config["side_effect.penalty"] = args.penalty
    config["run_type"] = "train"

    # Global seeding — mirrors start-training.py:204-220.
    seed = np.random.SeedSequence(args.seed)
    set_rng(np.random.default_rng(seed))
    torch.manual_seed(seed.entropy & (2**31 - 1))

    envs = build_environments(config, data_dir)
    obs_shape = envs["training"][0].observation_space.shape
    algo_args = {
        "training_envs": envs["training"],
        "testing_envs": envs.get("validation"),
        "data_logger": logging_setup.setup_data_logger(data_dir, "training"),
    }
    if args.algo == "ppo":
        from training.ppo import PPO as algo_cls
        algo_args["model"] = models.SafeLifePolicyNetwork(obs_shape)
    else:
        from training.dqn import DQN as algo_cls
        algo_args["training_model"] = models.SafeLifeQNetwork(obs_shape)
        algo_args["target_model"] = models.SafeLifeQNetwork(obs_shape)
    algo = algo_cls(**algo_args)
    algo.train(int(args.steps))
    print("done:", data_dir)


if __name__ == "__main__":
    main()
