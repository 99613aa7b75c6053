"""Canonical environment registry and a gym-like convenience wrapper.

Parity: ``SafeLifeEnv.register`` (reference safelife_env.py:231-246)
registers eight canonical environments with OpenAI Gym. Here the registry
maps the same names to environment specs, and :func:`make` returns a
:class:`BatchedSafeLifeEnv` — a thin stateful wrapper over the functional
batched step for users who want the familiar ``reset()``/``step()`` shape
(the functional API in :mod:`safelife_tpu.env` remains the primary,
scalable interface).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .env import env as E
from .env.state import pack_levels
from .io.iterator import SafeLifeLevelIterator

#: name -> level paths + env-config overrides
ENV_REGISTRY = {}


def register(name, levels, **env_kwargs):
    ENV_REGISTRY[name] = {"levels": levels, "env_kwargs": env_kwargs}


for _name in ["append-still", "prune-still",
              "append-still-easy", "prune-still-easy",
              "append-spawn", "prune-spawn",
              "navigation", "challenge"]:
    register("safelife-%s-v1" % _name, ["random/" + _name])


class BatchedSafeLifeEnv:
    """Stateful convenience wrapper over the functional batched env.

    Holds a device level pool (generated from the spec's level paths), the
    current :class:`EnvState`, and a PRNG key; ``step`` applies one
    lockstep update across the batch. Single-env use is just
    ``batch_size=1`` (arrays keep the leading batch axis).
    """

    def __init__(self, cfg, levels, batch_size=1, seed=None, pool_size=16):
        self.cfg = cfg
        it = SafeLifeLevelIterator(*levels, seed=seed)
        self.pool = pack_levels([next(it) for _ in range(pool_size)])
        self.batch_size = batch_size
        self._key = jax.random.PRNGKey(
            seed if isinstance(seed, int) else 0)
        self.state = None

    @property
    def num_agents(self):
        return self.pool.num_agents

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def reset(self):
        self.state, obs = E.reset(
            self.cfg, self.pool, self._next_key(), self.batch_size)
        return obs

    def step(self, actions):
        if self.state is None:
            raise RuntimeError("call reset() before step()")
        actions = jnp.asarray(np.asarray(actions), jnp.int32)
        if actions.ndim == 1:
            actions = actions[:, None]
        self.state, obs, reward, done, info = E.step(
            self.cfg, self.pool, self.state, actions, self._next_key())
        return obs, reward, done, info

    def render(self, lane=0):
        from .render.text import render_board

        return render_board(np.asarray(self.state.board[lane]),
                            np.asarray(self.state.goals[lane]))


def make(name, batch_size=1, seed=None, **env_overrides):
    """Instantiate a registered environment by canonical name."""
    if name not in ENV_REGISTRY:
        raise KeyError(
            "unknown environment '%s'; registered: %s"
            % (name, sorted(ENV_REGISTRY)))
    spec = ENV_REGISTRY[name]
    cfg = E.EnvConfig(view_shape=(25, 25), **spec["env_kwargs"])
    if env_overrides:
        cfg = dataclasses.replace(cfg, **env_overrides)
    return BatchedSafeLifeEnv(cfg, spec["levels"], batch_size=batch_size,
                              seed=seed)
