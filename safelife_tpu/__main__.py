"""Command-line interface: ``python -m safelife_tpu <command>``.

Subcommands (parity: reference ``safelife/__main__.py`` +
``start-training.py``):

* ``train``  — run PPO/DQN training on a task.
* ``print``  — generate/load levels and print them to the terminal.
* ``play``   — interactive terminal game.
* ``new``    — generate levels and save them to disk.
* ``render`` — render level files to png/gif/mp4.
* ``bench``  — environment throughput benchmark.
"""

import argparse
import json
import logging
import os
import sys


def _pin_platform():
    """Make the ``JAX_PLATFORMS`` environment variable authoritative.

    Some site shims (e.g. tunneled-TPU images) re-register their backend
    after clearing the environment's platform selection, so an exported
    ``JAX_PLATFORMS=cpu`` would still initialize — and possibly block
    on — the accelerator backend. Pinning the selection through
    ``jax.config`` after import restores the documented env contract.
    """
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main(argv=None):
    _pin_platform()
    from .utils.cache import enable_compilation_cache
    enable_compilation_cache()
    parser = argparse.ArgumentParser(prog="safelife_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_train = sub.add_parser("train", help="train an agent")
    p_train.add_argument("data_dir", nargs="?", default=None,
                         help="directory for logs/checkpoints")
    p_train.add_argument("--algo", choices=("ppo", "dqn"), default="ppo")
    p_train.add_argument("-e", "--env-type", default="append-still")
    p_train.add_argument("--steps", type=float, default=6e6)
    p_train.add_argument("--batch", type=int, default=64)
    p_train.add_argument("--seed", type=int, default=None)
    p_train.add_argument("--benchmark-episodes", type=int, default=1000)
    p_train.add_argument("--skip-benchmark", action="store_true")
    p_train.add_argument("-x", "--extra-params", default=None, help=(
        "JSON dict of config overrides, e.g. "
        "'{\"ppo.gamma\": 0.99, \"side_effect.penalty\": 0.5}'"))
    p_train.add_argument("--run-type", default="train",
                         choices=("train", "benchmark", "inspect"),
                         help="'benchmark' evaluates the latest checkpoint "
                              "in data_dir without training; 'inspect' "
                              "builds the environments and drops into an "
                              "interactive shell")
    p_train.add_argument("--wandb", action="store_true",
                         help="log to Weights & Biases (two-way config "
                              "sync for sweeps)")
    p_train.add_argument("--port", type=int, default=None,
                         help="launch tensorboard on this port")

    p_print = sub.add_parser("print", help="print levels to the terminal")
    p_print.add_argument("paths", nargs="+")
    p_print.add_argument("--seed", type=int, default=None)
    p_print.add_argument("-n", "--num", type=int, default=1)

    p_play = sub.add_parser("play", help="interactive terminal game")
    p_play.add_argument("paths", nargs="*", default=["random/append-still"])
    p_play.add_argument("--seed", type=int, default=None)
    p_play.add_argument("--centered", action="store_true")
    p_play.add_argument("--record", default=None, metavar="DIR",
                        help="save play history as rec-NNN.npz files "
                             "under DIR")
    p_play.add_argument("--gl", action="store_true",
                        help="graphical window (pygame) instead of the "
                             "terminal renderer")

    p_new = sub.add_parser("new", help="generate and save levels")
    p_new.add_argument("param_file")
    p_new.add_argument("out", help="output file or directory")
    p_new.add_argument("-n", "--num", type=int, default=1)
    p_new.add_argument("--seed", type=int, default=None)
    p_new.add_argument("--archive", action="store_true",
                       help="pack all levels into one npz archive")

    p_render = sub.add_parser("render", help="render levels to images/video")
    p_render.add_argument("paths", nargs="+")
    p_render.add_argument("--steps", type=int, default=0,
                          help="evolve the board and render a movie")
    p_render.add_argument("--fmt", default=None,
                          choices=(None, "png", "gif", "mp4"))

    sub.add_parser("bench", help="run the environment benchmark")

    args = parser.parse_args(argv)
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s: %(message)s")

    if args.cmd == "train":
        cmd_train(args)
    elif args.cmd == "print":
        cmd_print(args)
    elif args.cmd == "play":
        from .interactive import play_cmd
        play_cmd(args)
    elif args.cmd == "new":
        cmd_new(args)
    elif args.cmd == "render":
        cmd_render(args)
    elif args.cmd == "bench":
        import runpy
        import os
        runpy.run_path(os.path.join(os.path.dirname(
            os.path.dirname(__file__)), "bench.py"), run_name="__main__")


def _confirm_data_dir(data_dir):
    """Prompt before reusing an existing training directory.

    Parity: start-training.py:126-140 — overwrite / append / abort, with
    ``tmp*``-named directories auto-overwritten. Non-interactive runs
    (no tty: schedulers, tests, multi-host workers) append, which is the
    safe default: checkpoints resume and logs accumulate.
    """
    import shutil

    data_dir = os.path.realpath(data_dir)
    if not os.path.exists(data_dir):
        return
    if os.path.basename(data_dir).startswith("tmp"):
        response = "overwrite"
    elif not sys.stdin.isatty():
        # Runs before setup_logging configures handlers, so a logger
        # call would be dropped in exactly the non-interactive runs this
        # message exists for.
        print("'%s' already exists; appending to it (no tty to ask)"
              % data_dir, file=sys.stderr)
        return
    else:
        print("The directory '%s' already exists." % data_dir)
        response = None
        while response not in ("overwrite", "append", "abort"):
            try:
                response = input("(overwrite / append / abort) > ").strip()
            except EOFError:  # stdin closed at the prompt
                response = "abort"
    if response == "overwrite":
        print("Overwriting old data.")
        shutil.rmtree(data_dir)
    elif response == "abort":
        print("Aborting.")
        sys.exit(0)


def cmd_train(args):
    import jax

    from .parallel import mesh as M
    from .training import train as T
    from .training.env_factory import build_environments
    from .training.global_config import config
    from .training.logging_setup import setup_logging

    # Multi-host runs join the coordinator before any device use; a
    # documented no-op without a configured coordinator.
    proc, nprocs = M.initialize_distributed()
    if nprocs > 1:
        logging.getLogger(__name__).info(
            "distributed: process %d/%d, %d global devices",
            proc, nprocs, len(jax.devices()))

    if args.data_dir and args.run_type == "train":
        # Host 0 alone decides what happens to an existing directory
        # (uncoordinated rmtree across hosts on a shared filesystem would
        # race); the barrier keeps other hosts from writing into a
        # directory host 0 may be deleting.
        if proc == 0:
            _confirm_data_dir(args.data_dir)
        if nprocs > 1:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices("data_dir_confirmed")

    setup_logging(args.data_dir)
    if args.extra_params:
        config.update(json.loads(args.extra_params))
    config["env_type"] = args.env_type
    config["run_type"] = args.run_type
    config.setdefault("run_type", args.run_type)  # mark as consumed
    if args.seed is not None:
        config["seed"] = args.seed

    if args.wandb:
        # Two-way config sync (parity: start-training.py:155-190): sweep
        # parameters flow wandb -> config; everything else config -> wandb.
        import wandb
        wandb.init(project="safelife-tpu", config=dict(config))
        config.update({k: v for k, v in wandb.config.items()
                       if k not in ("env_type", "run_type")})
        config["_wandb"] = True

    tb_proc = None
    if args.port and args.data_dir:
        import subprocess
        try:
            tb_proc = subprocess.Popen(
                ["tensorboard", "--logdir", args.data_dir,
                 "--port", str(args.port)],
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        except (FileNotFoundError, OSError) as exc:
            logging.getLogger(__name__).warning(
                "could not launch tensorboard (%s); continuing without it",
                exc)

    try:
        bundle = build_environments(config, data_dir=args.data_dir,
                                    num_envs=args.batch)
        if args.run_type == "inspect":
            # Parity: start-training.py:282-285 — envs/config built, then
            # an interactive shell for poking at them.
            ns = {"bundle": bundle, "config": config, "jax": jax, "T": T}
            try:
                from IPython import embed
                embed(user_ns=ns)
            except ImportError:
                import code
                code.interact(
                    banner="safelife-tpu inspect shell: bundle, config, "
                           "jax, T", local=ns)
            return
        if args.run_type == "benchmark":
            model, params = T.load_for_eval(
                args.algo, bundle, args.data_dir)
        elif args.algo == "ppo":
            model, state = T.train_ppo(
                bundle, total_steps=args.steps, batch_size=args.batch,
                seed=args.seed or 0, data_dir=args.data_dir)
            params = state.params
        else:
            model, state = T.train_dqn(
                bundle, total_steps=args.steps, batch_size=args.batch,
                seed=args.seed or 0, data_dir=args.data_dir)
            params = state.params
        if not args.skip_benchmark and (bundle.benchmark_levels
                                        or bundle.validation_levels) \
                and M.is_logging_host():
            T.run_benchmark(model, params, bundle, args.data_dir,
                            jax.random.PRNGKey(args.seed or 0),
                            num_episodes=args.benchmark_episodes)
        config.check_for_unused()
    finally:
        if tb_proc is not None:
            tb_proc.terminate()
        try:
            bundle.pool_manager.close()  # non-daemon procgen workers
        except (NameError, AttributeError):
            pass
        if nprocs > 1:
            jax.distributed.shutdown()


def _iter_levels(paths, seed, num):
    from .io.iterator import SafeLifeLevelIterator

    it = SafeLifeLevelIterator(*paths, seed=seed)
    for _ in range(num):
        try:
            yield next(it)
        except StopIteration:
            return


def cmd_print(args):
    from .render.text import render_board

    for lv in _iter_levels(args.paths, args.seed, args.num):
        print("#", lv.name)
        sys.stdout.write(render_board(lv.board, lv.goals))
        print()


def cmd_new(args):
    import os

    from .io.levels import save_archive, save_level

    levels = list(_iter_levels([args.param_file], args.seed, args.num))
    if args.archive or args.out.endswith(".npz") and args.num > 1:
        save_archive(levels, args.out)
        print("wrote %d levels to %s" % (len(levels), args.out))
    elif args.num == 1:
        save_level(levels[0], args.out)
        print("wrote %s" % args.out)
    else:
        os.makedirs(args.out, exist_ok=True)
        for i, lv in enumerate(levels):
            save_level(lv, os.path.join(args.out, "level-%03d.npz" % i))
        print("wrote %d levels to %s/" % (len(levels), args.out))


def cmd_render(args):
    from .render.graphics import render_file

    for path in args.paths:
        out = render_file(path, steps=args.steps, movie_format=args.fmt)
        print("rendered", out)


if __name__ == "__main__":
    main()
