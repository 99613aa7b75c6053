"""Rank the compiled env step's fusions by the TPU compiler's own cycle
estimates (``estimated_cycles`` frontend attributes in the compiled HLO).

``jax.profiler`` hangs over the tunneled device, so this static ranking is
the profiling story here: it attributes the step's time to named fusions
well enough to aim optimization (validated round 2 against wall-clock
deltas when kernels were swapped).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python bench/profile_step.py [packed]
"""

import re
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from safelife_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from safelife_tpu.env import env as E
from safelife_tpu.env.state import pack_levels
from safelife_tpu.io.levels import load_levels
from safelife_tpu.training.env_factory import TRAINING_CHANNELS

BATCH = 4096


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "channels"
    pool = pack_levels(load_levels(
        "/root/repo/safelife_tpu/levels/benchmarks/v1.0/append-still.npz"))
    cfg = E.EnvConfig(
        view_shape=(25, 25),
        output_channels=None if mode == "packed" else TRAINING_CHANNELS,
        time_limit=1000, goals_may_evolve=False, stochastic=False,
        auto_reset=True, flat_obs=(mode == "flat"),
    )
    state, obs = E.reset(cfg, pool, jax.random.PRNGKey(0), BATCH)
    actions = jnp.zeros((BATCH, pool.num_agents), jnp.int32)

    def one_step(state, actions, key):
        return E.step_impl(cfg, pool, state, actions, key)

    compiled = jax.jit(one_step).lower(
        state, actions, jax.random.PRNGKey(1)).compile()
    text = compiled.as_text()
    # estimated cycles appear as  "_estimated_cycles":"N"  or
    # estimated_cycles="N" depending on compiler version; catch both.
    pat = re.compile(
        r'%?([\w.\-]+)[^\n]*?estimated_cycles[":\s=]+"?(\d+)')
    rows = []
    for m in pat.finditer(text):
        rows.append((int(m.group(2)), m.group(1)))
    rows.sort(reverse=True)
    total = sum(c for c, _ in rows)
    # Op-definition lines, for attributing named fusions to source ops.
    defs = {}
    for line in text.splitlines():
        s = line.strip()
        m = re.match(r"(?:ROOT )?%?([\w.\-]+) = (.+)", s)
        if m and m.group(1) not in defs:
            defs[m.group(1)] = m.group(2)
    print("total estimated cycles: %d (ops found: %d)" % (total, len(rows)))
    for cyc, name in rows[:25]:
        print("%12d  %5.1f%%  %s" % (cyc, 100.0 * cyc / max(total, 1), name))
        d = defs.get(name, "")
        if d:
            print("              %s" % d[:220])
    if not rows:
        # Fall back: dump the op names of the biggest fusions by byte size.
        sys.stdout.write(text[:4000])


if __name__ == "__main__":
    main()
