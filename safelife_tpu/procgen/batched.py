"""Cross-level batched level generation on device.

The host generator (:func:`~safelife_tpu.procgen.generate.gen_game`)
produces ~10 levels/s per worker — its annealing loop is inherently
serial. Here N levels generate in lockstep: each level runs as a
generator (:func:`gen_game_requests`) that yields its anneal requests;
this driver collects one round of requests across every in-flight level,
groups them by (board shape, period), answers each group with ONE call
into the device annealer (:mod:`safelife_tpu.procgen.anneal_jax` — N
lockstep Metropolis chains inside a single jit), and resumes the
generators. Host work (region partitioning, fences, decoration) stays
per-level NumPy between rounds; the annealing — where ~90% of the host
time goes — rides the accelerator.

Each level keeps its own ``numpy`` RNG stream for the host segments
(reproducible per level seed, independent of batch composition); the
device chains draw from one JAX key per round. Output distribution
matches the host generator (asserted statistically in
tests/test_procgen.py); draw streams intentionally differ.

MEASURED NEGATIVE RESULT (TPU v5e, bench/bench_procgen.py): the device
path does NOT beat host generation and stays opt-in
(``env.device_procgen``), like the Pallas physics appendix
(ops/physics.py::use_fused_physics). On the real chip:

    batch   8:  2.0 levels/s  (host single worker: 6.7)   0.30x
    batch  64:  3.6 levels/s  (host single worker: 7.1)   0.51x
    batch 256:  2.7 levels/s  (host single worker: 7.3)   0.37x

Why it loses: each anneal round is a tiny-board (~15x15xN) Metropolis
sweep — far below MXU/VPU saturation, so the per-call tunnel latency
(25-50 ms) and the round-lockstep barrier dominate; stragglers serialize
(one level needing 300+ rounds holds the whole batch), and re-batching
by (shape, period) fragments the groups as levels diverge. Peak device
rate (b=64) is ~0.5x ONE host worker; the default 4-worker host pool is
~8x better still, and procgen already overlaps training via the async
pool refresh, so generation latency is off the training path entirely.
The implementation stays for its distribution-parity tests and as the
substrate for any future on-device curriculum search.
"""

import numpy as np

import jax

from ..utils.rng import set_rng
from . import anneal_jax as AJ
from .generate import gen_game_requests

_DEFAULTS = dict(max_iter=40.0, min_fill=0.2, temperature=0.5,
                 osc_bonus=0.3, alive=(0.0, 0.0), wall=(100.0, 100.0),
                 tree=(100.0, 100.0))


def _pack_group(requests):
    """Stack one round's (board, flags, seeds, params) requests into the
    batched-annealer arrays, applying gen_pattern's parameter defaults."""
    boards = np.stack([np.asarray(b, np.int32) for b, _, _, _ in requests])
    flags = np.stack([np.asarray(f, np.int32) for _, f, _, _ in requests])
    # gen_pattern seed default: any nonzero mask flag marks a seed cell.
    seeds = np.stack([
        (np.asarray(f if s is None else s) != 0)
        for _, f, s, _ in requests])

    def col(name):
        return np.array([float(p.get(name, _DEFAULTS[name]))
                         for _, _, _, p in requests], np.float32)

    min_fill = col("min_fill")
    max_fill = np.array([
        float(p.get("max_fill", 2.0 * float(p.get("min_fill",
                                                  _DEFAULTS["min_fill"]))))
        for _, _, _, p in requests], np.float32)
    pen = np.stack([
        np.concatenate([[0.0, 0.0],
                        np.asarray(p.get("wall", _DEFAULTS["wall"]),
                                   np.float32),
                        np.asarray(p.get("alive", _DEFAULTS["alive"]),
                                   np.float32),
                        np.asarray(p.get("tree", _DEFAULTS["tree"]),
                                   np.float32)])
        for _, _, _, p in requests]).astype(np.float32)
    params = dict(min_fill=min_fill, max_fill=max_fill,
                  max_iter=col("max_iter"), temperature=col("temperature"),
                  osc_bonus=col("osc_bonus"), penalties=pen)
    return boards, flags, seeds, params


def _pad_to_bucket(arrs, params, bucket):
    """Pad the lane axis up to ``bucket`` with inert lanes (zero mask ->
    resolved immediately) so the annealer jit cache stays small."""
    n = arrs[0].shape[0]
    if n == bucket:
        return arrs, params, n
    pad = bucket - n

    def padded(a, fill=0):
        shape = (pad,) + a.shape[1:]
        return np.concatenate([a, np.full(shape, fill, a.dtype)])

    arrs = tuple(padded(a) for a in arrs)
    params = {k: padded(v, 1 if v.ndim == 1 else 0)
              for k, v in params.items()}
    return arrs, params, n


def _anneal_group(requests, period, key, bucket_sizes=(8, 32, 128, 512)):
    """Answer one round's worth of same-shape, same-period requests with
    a single device-annealer call. Returns the annealed boards (each the
    dtype of its request board)."""
    boards, flags, seeds, params = _pack_group(requests)
    params["period"] = period
    bucket = next((b for b in bucket_sizes if b >= len(requests)),
                  len(requests))
    (boards_p, flags_p, seeds_p), params_p, n = _pad_to_bucket(
        (boards, flags, seeds), {k: v for k, v in params.items()
                                 if k != "period"}, bucket)
    params_p["period"] = period
    out, _ok = AJ.anneal_with_retries_batched(
        boards_p, flags_p, seeds_p, params_p, key)
    out = np.asarray(jax.device_get(out))[:n]
    return [o.astype(np.asarray(b).dtype)
            for o, (b, _, _, _) in zip(out, requests)]


def gen_games_batched(param_dicts, rngs, key):
    """Generate ``len(param_dicts)`` levels with device-batched annealing.

    Parameters
    ----------
    param_dicts : list of task parameter dicts (the ``gen_game`` schema,
        typically a parsed ``random/*.yaml``), one per level.
    rngs : list of ``np.random.Generator`` — per-level host RNG streams
        (region partitioning, parameter DSL, decoration).
    key : JAX PRNG key driving the device annealing chains.

    Returns a list of :class:`~safelife_tpu.io.levels.Level`.
    """
    n = len(param_dicts)
    gens = [None] * n
    results = [None] * n
    pending = {}
    for i in range(n):
        with set_rng(rngs[i]):
            g = gen_game_requests(**param_dicts[i])
            try:
                pending[i] = next(g)
                gens[i] = g
            except StopIteration as stop:
                results[i] = stop.value

    while pending:
        groups = {}
        for i, (board, flags, seeds, params) in pending.items():
            gkey = (board.shape, int(params.get("period", 1)))
            groups.setdefault(gkey, []).append(i)
        new_pending = {}
        for (shape, period), idxs in sorted(groups.items()):
            key, sub = jax.random.split(key)
            answers = _anneal_group([pending[i] for i in idxs], period, sub)
            for i, ans in zip(idxs, answers):
                with set_rng(rngs[i]):
                    try:
                        new_pending[i] = gens[i].send(ans)
                    except StopIteration as stop:
                        results[i] = stop.value
        pending = new_pending
    return results
