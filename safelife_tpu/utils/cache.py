"""Persistent XLA compilation cache wiring.

The full training step compiles in tens of seconds on a tunneled TPU
(~69 s measured for the bench program) and the reference pays nothing
comparable, so every entry point opts into JAX's persistent compilation
cache: the cost is paid once per machine, after which warmup is seconds.

Opt out (or redirect) with ``SAFELIFE_TPU_CACHE_DIR``:

* unset        -> ``~/.cache/safelife_tpu/xla`` (created on demand)
* ``=off``/``=0``/``=none`` -> disabled
* ``=PATH``    -> that directory
"""

import logging
import os

logger = logging.getLogger(__name__)

_DEFAULT_DIR = os.path.join("~", ".cache", "safelife_tpu", "xla")


def enable_compilation_cache():
    """Point JAX's persistent compilation cache at a per-machine dir.

    Safe to call multiple times and before/after backend initialization
    (the cache config is read per compilation). Never raises: an unusable
    cache directory only costs the warm-start, so failures downgrade to a
    log line.
    """
    raw = os.environ.get("SAFELIFE_TPU_CACHE_DIR", "")
    if raw.strip().lower() in ("off", "0", "none", "disable", "disabled"):
        return None
    # TPU-only: XLA:CPU cache entries are AOT host executables keyed
    # loosely enough that an entry compiled on one machine can load on
    # another with different CPU features and die with SIGILL (observed:
    # a 2-process CPU training run silently hanging after
    # "cpu_aot_loader.cc: ... doesn't match the machine type"). CPU
    # compiles are seconds anyway; the 60s+ compile this cache exists
    # for is the tunneled-TPU one.
    platforms = (os.environ.get("JAX_PLATFORMS") or "").strip().lower()
    if platforms and all(
            p.strip() in ("cpu", "") for p in platforms.split(",")):
        return None
    cache_dir = os.path.expanduser(raw or _DEFAULT_DIR)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache every compilation that takes noticeable time; the default
        # (1 s floor) would already cover the programs that matter, but the
        # explicit floor documents the intent and survives default drift.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:  # pragma: no cover - depends on site config
        logger.warning("compilation cache disabled: %s", e)
        return None
    return cache_dir
