"""Level supply: iterators over static files and procedural generation,
plus a device-pool manager for lockstep training.

Parity: reference ``safelife/level_iterator.py`` — path resolution with
level-directory fallback, async pregeneration via a multiprocessing pool,
per-level ``SeedSequence.spawn`` seeding (the reproducible-seeding
contract), the ``distinct_levels`` cache, and the overridable
``get_next_parameters`` hook used by curriculum iterators.

New for the TPU design: :class:`LevelPoolManager` keeps a packed
:class:`~safelife_tpu.env.state.LevelBatch` on device and swaps freshly
generated levels into it between training iterations — the lockstep-env
analog of the reference's queue of pregenerated game objects.
"""

import multiprocessing
import os
import queue
import signal

import numpy as np
import yaml

from ..utils.rng import set_rng
from . import levels as L


def _load_param_file(file_name):
    with open(file_name) as f:
        data = yaml.safe_load(f)

    # Merge with the defaults file packaged next to the param file when one
    # exists (this lets reference level trees keep their own defaults);
    # otherwise fall back to our packaged defaults.
    candidates = [
        os.path.join(os.path.dirname(file_name), "_defaults.yaml"),
        os.path.join(L.LEVEL_DIRECTORY, "random", "_defaults.yaml"),
    ]
    defaults = {}
    for c in candidates:
        if os.path.exists(c) and os.path.abspath(c) != \
                os.path.abspath(file_name):
            with open(c) as f:
                defaults = yaml.safe_load(f) or {}
            break
    merged = {**defaults, **(data or {})}
    for key in ("named_regions", "agent_types"):
        merged[key] = {**defaults.get(key, {}), **(data or {}).get(key, {})}
    return merged


def load_files(paths):
    """Resolve paths into [(name, kind, data)] entries; kind is 'procgen'
    or 'static'."""
    if not paths:
        return [[None, "procgen", {}]]
    out = []
    for file_name in L.find_files(*paths):
        if file_name.endswith((".yaml", ".json")):
            out.append([file_name, "procgen", _load_param_file(file_name)])
        else:
            for lv in L.load_levels_npz(file_name):
                name = os.path.join(file_name[:-4], lv.name) \
                    if lv.name else file_name
                out.append([name, "static", lv])
    return out


def _level_from_data(file_name, data_type, data, seed=None):
    from ..procgen.generate import gen_game

    if data_type == "procgen":
        with set_rng(np.random.default_rng(seed)):
            lv = gen_game(**data)
    else:
        lv = data.copy()
    if file_name:
        lv.name = os.path.basename(str(file_name)).replace(".yaml", "") \
            .replace(".json", "")
        if seed is not None and getattr(seed, "spawn_key", None):
            lv.name += "-e" + str(seed.spawn_key[-1])
    return lv


def _init_worker():
    signal.signal(signal.SIGINT, signal.SIG_IGN)
    # Kernel-guaranteed reaping: if the parent dies (even by SIGKILL),
    # this worker dies with it instead of orphaning — a leaked worker
    # holds the parent's inherited pipes open and can wedge whatever is
    # waiting for their EOF (observed with a test harness collecting the
    # training CLI's output).
    try:
        import ctypes

        ctypes.CDLL(None).prctl(1, signal.SIGKILL)  # PR_SET_PDEATHSIG
    except Exception:
        pass


class SafeLifeLevelIterator:
    """Yields :class:`~safelife_tpu.io.levels.Level` objects from files or
    procgen parameters. See the module docstring for parity notes."""

    def __init__(self, *paths, repeat_levels=None, distinct_levels=None,
                 num_workers=0, max_queue=10, seed=None, device_batch=0):
        self.file_data = load_files(paths)
        self.level_cache = []

        if repeat_levels is None:
            repeat_levels = any(d[1] == "procgen" for d in self.file_data)
        self.repeat_levels = repeat_levels
        self.distinct_levels = distinct_levels
        # device_batch > 0: answer procgen requests with the device-
        # batched annealer (procgen/batched.py), generating this many
        # levels per device call instead of one at a time on the host.
        self.device_batch = device_batch
        self.num_workers = 0 if device_batch else num_workers
        self.max_queue = max(max_queue if self.num_workers > 0 else 1,
                             device_batch)
        self.results = None
        self.pool = None
        self.idx = 0
        self.seed(seed)

    def seed(self, seed):
        if not isinstance(seed, np.random.SeedSequence):
            seed = np.random.SeedSequence(seed)
        self._seed = seed

    def get_next_parameters(self):
        """Parameters for the next level; override for curricula."""
        return self.file_data[self.idx % len(self.file_data)]

    def fill_queue(self):
        if self.device_batch:
            return self._fill_queue_batched()
        if self.results is None:
            self.results = queue.deque(maxlen=self.max_queue)
        if self.num_workers > 0 and self.pool is None:
            # Forked workers (spawn would re-execute __main__, breaking
            # script/stdin usage). The parent's live JAX runtime makes
            # fork technically unsafe for the children; generation itself
            # is pure NumPy and works, and close() guards the one
            # observed failure mode (a wedged worker hanging join) with
            # a kill watchdog.
            self.pool = multiprocessing.Pool(
                processes=self.num_workers, initializer=_init_worker)
        while len(self.results) < self.max_queue:
            if self.distinct_levels is not None \
                    and self.idx >= self.distinct_levels:
                break
            if not self.repeat_levels and self.idx >= len(self.file_data):
                break
            data = self.get_next_parameters()
            if data is None:
                break
            self.idx += 1
            kwargs = {"seed": self._seed.spawn(1)[0]}
            if self.num_workers > 0:
                result = self.pool.apply_async(
                    _level_from_data, data, kwargs)
            else:
                result = _level_from_data(*data, **kwargs)
            self.results.append((data, result))

    def _fill_queue_batched(self):
        """Refill the queue with one device-batched generation round.

        Same gating/bookkeeping as the host path (distinct_levels cache,
        repeat_levels, curriculum ``get_next_parameters``), but all
        pending procgen requests in the round anneal in ONE call into
        the lockstep device annealer; static entries pass through.

        Refills trigger only once the queue is EMPTY, and then generate
        a whole ``device_batch`` round: topping the queue back up on
        every ``__next__`` (the host path's behavior, where it overlaps
        worker latency) would degenerate to single-chain device rounds
        after the first fill — per-call batch sizes of [N, 1, 1, ...] —
        paying a full annealer dispatch per level and never amortizing
        across lockstep chains.
        """
        import jax

        from ..procgen.batched import gen_games_batched

        if self.results is None:
            self.results = queue.deque(maxlen=self.max_queue)
        if self.results:
            return
        pending = []
        while len(self.results) + len(pending) < self.max_queue:
            if self.distinct_levels is not None \
                    and self.idx >= self.distinct_levels:
                break
            if not self.repeat_levels and self.idx >= len(self.file_data):
                break
            data = self.get_next_parameters()
            if data is None:
                break
            self.idx += 1
            seed = self._seed.spawn(1)[0]
            if data[1] == "procgen":
                pending.append((data, seed))
            else:
                self.results.append(
                    (data, _level_from_data(*data, seed=seed)))
        if not pending:
            return
        # A dedicated spawn seeds the device chains, independent of the
        # per-level host streams.
        key = jax.random.PRNGKey(
            int(self._seed.spawn(1)[0].generate_state(1, np.uint32)[0]))
        levels = gen_games_batched(
            [d[2] for d, _ in pending],
            [np.random.default_rng(s) for _, s in pending], key)
        for (data, seed), lv in zip(pending, levels):
            if data[0]:
                lv.name = os.path.basename(str(data[0])) \
                    .replace(".yaml", "").replace(".json", "")
                if getattr(seed, "spawn_key", None):
                    lv.name += "-e" + str(seed.spawn_key[-1])
            self.results.append((data, lv))

    def close(self):
        """Terminate worker processes (idempotent).

        The entire terminate+join runs under a watchdog thread — not just
        the join: a worker wedged at fork can hang ``Pool.terminate``
        itself (its internal join loop), and in multi-host runs a single
        hung worker would stall the whole fleet's shutdown barrier. Any
        worker still alive after the grace period is SIGKILLed by pid.
        """
        import signal
        import threading

        pool, self.pool = self.pool, None
        if pool is None:
            return
        workers = list(getattr(pool, "_pool", []))

        def _teardown():
            try:
                pool.terminate()
                pool.join()
            except Exception:
                pass

        t = threading.Thread(target=_teardown, daemon=True)
        t.start()
        t.join(timeout=10)
        for worker in workers:
            try:
                if worker.is_alive():
                    os.kill(worker.pid, signal.SIGKILL)
            except Exception:
                pass

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def __getstate__(self):
        state = self.__dict__.copy()
        if self.num_workers > 0:
            state["pool"] = None
            state["results"] = queue.deque(
                [r.get() if hasattr(r, "get") else r for r in self.results],
                maxlen=self.max_queue)
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)

    def __iter__(self):
        return self

    def __next__(self):
        self.fill_queue()
        if not self.results and self.distinct_levels is not None:
            if not self.repeat_levels and self.idx >= self.distinct_levels:
                raise StopIteration
            data = self.level_cache[self.idx % self.distinct_levels]
            result = _level_from_data(*data)
            self.idx += 1
        elif not self.results:
            raise StopIteration
        else:
            data, result = self.results.popleft()
        if hasattr(result, "get"):
            result = result.get()
        if (self.distinct_levels is not None
                and len(self.level_cache) < self.distinct_levels):
            if data[1] == "procgen":
                data = (data[0], "static", result.copy())
            self.level_cache.append(data)
        return result


class LevelPoolManager:
    """Maintains a device-resident level pool refreshed from an iterator.

    Training lanes auto-reset by sampling the pool on device; between
    training iterations, call :meth:`refresh` to swap newly generated levels
    into pool slots (round-robin), keeping level diversity without ever
    blocking the device on the generator.
    """

    def __init__(self, iterator, pool_size=64, pad_agents=None,
                 pad_exits=None):
        import jax

        from ..core import cells as C
        from ..env.state import pack_levels

        self._pack = pack_levels
        self.iterator = iterator
        self.pad_agents = pad_agents
        self.pad_exits = pad_exits
        levels = [next(iterator) for _ in range(pool_size)]
        self._host_levels = levels
        self._pending = []  # generated levels waiting for a free slot
        self._slot = 0
        self._restored_meta = None
        self._meta = None  # live per-slot metadata cache (level_meta)
        self._multihost = jax.process_count() > 1
        if not self._multihost:
            self.pool = self._pack(levels, pad_agents, pad_exits)
            self._local_pool = None
            return

        # Multi-host: every host generates its own levels (per-host seed
        # streams), the device pool is the allgathered union — identical
        # on every host, as required for it to ride through the SPMD
        # training step. Paddings must agree fleet-wide.
        from jax.experimental import multihost_utils

        from ..parallel import mesh as M

        from ..core.scoring import rows_packable
        from ..env.state import goals_are_static

        la = max([pad_agents or 1] + [lv.num_agents for lv in levels])
        le = max([pad_exits or 1] + [
            int(((lv.board & (C.EXIT | C.AGENT)) == C.EXIT).sum())
            for lv in levels])
        # The static pool flags must agree BEFORE packing: rows_packed
        # decides the row_w0/row_w8 array shapes, and an allgather over
        # shape-mismatched per-host pools would crash the fleet.
        local_flags = [
            all(rows_packable(np.asarray(lv.points_table))
                for lv in levels),
            all(goals_are_static(lv.goals) for lv in levels),
            not any(bool(((lv.board | lv.goals) & C.SPAWNING).any())
                    for lv in levels),
        ]
        agreed = multihost_utils.process_allgather(
            np.asarray([la, le] + [int(f) for f in local_flags]))
        pads = agreed[:, :2].max(axis=0)
        flags = tuple(bool(f) for f in agreed[:, 2:].all(axis=0))
        self._local_pool = self._pack(levels, int(pads[0]), int(pads[1]),
                                      force_flags=flags)
        self.pool = M.allgather_level_pool(self._local_pool)

    def close(self):
        """Shut down the backing iterator's worker processes."""
        self.iterator.close()

    def restore_pool(self, arrays):
        """Install a checkpointed pool in place of the freshly built one.

        Resumed mid-episode lanes reference level data by pool slot
        (``EnvState.level_idx`` → :func:`~..env.env.lane_level` gathers
        the points table / exits / spawn prob per step), so a restored
        training state is only scored correctly against the exact pool it
        was checkpointed with — a rebuilt pool would silently swap every
        running episode's level metadata. Slot *names* are not persisted:
        episode records logged after a resume carry generic
        ``restored/slot-N`` names (with reward metadata recomputed from
        the restored arrays) until :meth:`refresh` rotates freshly
        generated levels in.

        ``arrays`` is the checkpoint's raw pool field dict. The static
        flags (rows_packed / all_goals_static / spawner_free) are pytree
        aux data and so are NOT checkpointed — they are recomputed here
        from the restored content rather than inherited from the resume
        run's freshly generated pool, whose levels may legitimately
        differ (e.g. a spawner-free fresh draw must not pin
        spawner_free=True onto restored spawner levels). Returns the
        installed pool.
        """
        import jax

        from ..core import cells as C
        from ..core import scoring
        from ..env.state import LevelBatch

        arrays = dict(arrays)
        b = np.asarray(arrays["board"])
        g = np.asarray(arrays["goals"])
        # A resumed run's lanes index pool slots by position, and
        # refresh() reassembles the global pool from per-host slices —
        # both silently corrupt if the slot count changed between runs.
        expect = len(self._host_levels) * (
            jax.process_count() if self._multihost else 1)
        fresh_hw = np.asarray(
            (self._local_pool if self._multihost else self.pool)
            .board).shape[-2:]
        if b.shape[0] != expect or b.shape[-2:] != tuple(fresh_hw):
            raise ValueError(
                "checkpointed level pool is %s but this run built %s "
                "(pool_size, board size, or process count changed); "
                "resume with matching settings or start a fresh data_dir"
                % (b.shape, (expect,) + tuple(fresh_hw)))
        if "reset_boards" not in arrays:  # pre-stack checkpoint layouts
            closed = np.asarray(arrays.pop("reset_board"))
            if "reset_board_open" in arrays:
                opened = np.asarray(arrays.pop("reset_board_open"))
            else:
                # Oldest layout stored only the positive-fraction
                # recoloring; recompute the fraction-0 (exits open)
                # variant from the raw boards exactly as pack-time
                # _derived_fields does, instead of aliasing the closed
                # one (which would keep exits shut at t=0 after resume).
                locs = np.asarray(arrays["agent_locs"])
                mask = np.asarray(arrays["agent_mask"])
                cells = scoring.agent_cells(b, locs)
                active = ((np.asarray(cells) & C.AGENT) != 0) & mask
                opened = np.asarray(scoring.update_exit_colors(
                    b, locs, mask, np.asarray(arrays["exit_mask"]),
                    active, cells=cells))
            arrays["reset_boards"] = np.stack([closed, opened], axis=1)
        packed = LevelBatch(
            **arrays,
            rows_packed=np.asarray(arrays["row_w8"]).shape[-2:] != (1, 1),
            all_goals_static=bool(np.all(np.asarray(
                arrays["goals_static"]))),
            spawner_free=not bool(((b | g) & C.SPAWNING).any()),
        )
        # _host_levels still holds the discarded fresh draws, so expose
        # honest per-slot metadata recomputed from the restored arrays
        # instead (overlaid in level_meta, dropped per slot by refresh).
        avail = np.asarray(packed.available_points)
        req = np.asarray(packed.required_points)
        mask = np.asarray(packed.agent_mask)
        mperf = np.asarray(packed.min_performance)
        self._restored_meta = {
            i: {"name": "restored/slot-%d" % i,
                "reward_possible": float(
                    (avail[i] + scoring.POINTS_ON_LEVEL_EXIT)
                    [mask[i]].sum()),
                "reward_needed": int(req[i][mask[i]].sum()),
                "min_performance": float(mperf[i])}
            for i in range(avail.shape[0])}
        if self._meta is not None:
            self._meta.update(self._restored_meta)
        if not self._multihost:
            self.pool = packed
            return self.pool
        # Checkpointed pools come back as globally-replicated arrays;
        # the manager keeps host-local copies (this host's slice feeds
        # refresh(), the full pool is re-allgathered from it).
        packed = jax.tree.map(np.asarray, jax.device_get(packed))
        n = len(self._host_levels)
        off = jax.process_index() * n
        self._local_pool = jax.tree.map(
            lambda x: x[off:off + n], packed)
        self.pool = packed
        return self.pool

    def _allgather_slot_names(self):
        """One collective: every host's slot names (+ a per-slot
        'authoritative' flag) as global arrays.

        Returns (names: list[str] length P_global, fresh: bool[P_global]).
        The flag is 1 when the owning host vouches for the name — the
        slot holds a known fresh/initial draw rather than a restored
        checkpoint level whose real name is unknown (_host_levels still
        holds the discarded fresh draws for those, see restore_pool).
        Single wire format for both level_meta() and refresh(); both
        sites MUST stay collective-symmetric across hosts.
        """
        import jax
        from jax.experimental import multihost_utils

        width = 64
        P = len(self._host_levels)
        off = jax.process_index() * P
        enc = np.zeros((P, width + 1), np.uint8)
        for i, lv in enumerate(self._host_levels):
            raw = (lv.name or "").encode()[:width]
            enc[i, :len(raw)] = np.frombuffer(raw, np.uint8)
            enc[i, width] = 0 if (self._restored_meta
                                  and off + i in self._restored_meta) else 1
        rows = multihost_utils.process_allgather(enc).reshape(-1, width + 1)
        names = []
        for g, row in enumerate(rows):
            body = row[:width]
            names.append(bytes(body[body != 0]).decode(errors="replace")
                         or ("level-%d" % g))
        return names, rows[:, width].astype(bool)

    def level_meta(self):
        """LIVE per-slot metadata keyed by *pool* index (global in
        multi-host runs: each host contributes full metadata for its own
        slice and allgathered names for the others, so episode records
        referencing foreign slots still resolve to a meaningful level
        name — e.g. for curriculum stage matching). Foreign names are
        re-gathered on every refresh() (same wire format), so the cache
        tracks other hosts' swaps too.

        The returned dict is the manager's own cache: :meth:`refresh`
        mutates the entries of swapped slots in place, so holders (the
        training EpisodeCollector) always see the level currently in the
        slot without re-asking.
        """
        if self._meta is not None:
            return self._meta
        from ..training.runner import level_metadata

        local = level_metadata(self._host_levels)
        if not self._multihost:
            if self._restored_meta:
                local.update(self._restored_meta)
            self._meta = local
            return self._meta
        import jax

        names, _ = self._allgather_slot_names()
        offset = jax.process_index() * len(self._host_levels)
        meta = {i: {"name": name} for i, name in enumerate(names)}
        for i, m in local.items():
            meta[offset + i] = m
        if self._restored_meta:
            meta.update(self._restored_meta)
        self._meta = meta
        return self._meta

    def refresh(self, max_new=8, in_use=None):
        """Pull up to ``max_new`` ready levels and swap them into the pool.

        With a worker-backed iterator this only consumes already-finished
        results; generation latency overlaps device compute. The device
        update is one jitted call (over a tunneled device, per-op
        dispatches made naive refreshes take seconds).

        ``in_use`` is the set of pool slots currently referenced by live
        lanes (global slot indices; the training loop reads them from
        ``EnvState.level_idx`` between chunks). Slots in it are NEVER
        overwritten: every env step re-gathers the slot's points table /
        exit locations / required points by ``level_idx``
        (env/env.py:lane_level), so swapping a slot under a mid-episode
        lane silently re-scores the rest of its episode against a
        different level — measured in the round-4 parity sweep as a
        steady stream of zero-reward timeout episodes that depressed
        final reward fraction ~0.36 -> ~0.23 vs the reference. Levels
        with no free slot wait in ``self._pending`` for a later refresh.
        ``in_use=None`` skips the guard (callers without live lanes).

        The pool's static guarantees (rows_packed/all_goals_static/
        spawner_free) are pinned at construction: they are baked into the
        pytree aux data of every carried env state, so flipping them
        mid-run would make the carried state tree-incompatible with fresh
        states. Replacement levels that violate a guarantee are dropped
        (logged) instead — generation simply continues.
        """
        import logging

        import jax.numpy as jnp

        P = len(self._host_levels)
        new = []
        # Don't consume generator output that would only displace levels
        # already waiting for a slot (busy pools would churn the pending
        # queue while discarding everything).
        for _ in range(max(0, max_new - len(self._pending))):
            if self.iterator.num_workers > 0:
                self.iterator.fill_queue()
                if not self.iterator.results or not \
                        self.iterator.results[0][1].ready():
                    break
            try:
                new.append(next(self.iterator))
            except StopIteration:
                break
        kept = [lv for lv in new if self._level_compatible(lv)]
        if len(kept) < len(new):
            logging.getLogger(__name__).warning(
                "dropped %d generated level(s) violating the pool's "
                "static guarantees", len(new) - len(kept))
        self._pending.extend(kept)
        if len(self._pending) > max(4 * max_new, 32):
            # Bound the wait queue; newest levels are as good as old ones.
            self._pending = self._pending[-max(4 * max_new, 32):]

        import jax as _jax
        off = _jax.process_index() * P if self._multihost else 0
        busy = np.zeros(P * (_jax.process_count() if self._multihost
                             else 1), bool)
        if in_use is not None:
            busy[np.asarray(in_use, np.int64)] = True
        if self._multihost:
            # Lanes on any host may reference this host's slots (resets
            # sample the whole global pool), so the busy mask is the OR
            # across hosts. Unconditional collective: hosts disagree on
            # how many levels they have pending, but every host must
            # execute the same collective sequence every refresh.
            from jax.experimental import multihost_utils
            busy = np.asarray(
                multihost_utils.process_allgather(busy)).any(axis=0)

        # Victim slots: round-robin over this host's slice, skipping any
        # slot a live lane references.
        slots = []
        probe = self._slot
        for _ in range(P):
            if len(slots) >= len(self._pending):
                break
            if not busy[off + probe]:
                slots.append(probe)
            probe = (probe + 1) % P
        if self._pending and not slots:
            self._starved = getattr(self, "_starved", 0) + 1
            # Persistent starvation means the lane count saturates the
            # pool and level turnover has effectively stopped (training
            # continues on the current levels — correct, just less
            # diverse). Raise it once, loudly, with the knob to turn.
            log_fn = (logging.getLogger(__name__).warning
                      if self._starved == 10 else
                      logging.getLogger(__name__).info)
            log_fn(
                "level pool refresh deferred (%d in a row): all %d "
                "slots are in use by live lanes (%d level(s) pending). "
                "With many more lanes than pool slots no slot is ever "
                "free; raise env.pool_size (>= ~2x the lane count) if "
                "level turnover during training matters.",
                self._starved, P, len(self._pending))
        elif slots:
            self._starved = 0
        kept = self._pending[:len(slots)]
        self._pending = self._pending[len(slots):]
        if slots:
            self._slot = (slots[-1] + 1) % P

        target = self._local_pool if self._multihost else self.pool
        if kept:
            for lv, s in zip(kept, slots):
                self._host_levels[s] = lv
                if self._restored_meta:
                    # The slot now holds a known fresh level again.
                    self._restored_meta.pop(off + s, None)
            flags = (target.rows_packed, target.all_goals_static,
                     target.spawner_free)
            fresh = self._pack(kept, target.agent_locs.shape[-2],
                               target.exit_locs.shape[-2],
                               force_flags=flags)
            idx = jnp.asarray(slots, jnp.int32)
            target = _swap_rows(target, fresh, idx)
            if self._meta is not None:
                # Keep the live metadata cache (level_meta) pointing at
                # the levels now occupying the swapped slots. One batched
                # host fetch of the already-derived scoring fields — not
                # per-level device math.
                from ..core.scoring import POINTS_ON_LEVEL_EXIT
                av, rq, am, mp = (np.asarray(x) for x in _jax.device_get(
                    (fresh.available_points, fresh.required_points,
                     fresh.agent_mask, fresh.min_performance)))
                for i, lv in enumerate(kept):
                    self._meta[off + slots[i]] = {
                        "name": lv.name or ("level-%d" % slots[i]),
                        "reward_possible": float(
                            (av[i] + POINTS_ON_LEVEL_EXIT)[am[i]].sum()),
                        "reward_needed": int(rq[i][am[i]].sum()),
                        "min_performance": float(mp[i]),
                    }
        if self._multihost:
            # Collective: every host re-gathers the global pool every
            # refresh (even with nothing new locally), so the replicated
            # pool stays identical fleet-wide.
            from ..parallel import mesh as M

            self._local_pool = target
            self.pool = M.allgather_level_pool(target)
            # Re-gather slot NAMES too (unconditional, same ordering on
            # every host), patching the cached level_meta's *foreign*
            # entries in place — other hosts' swaps would otherwise
            # leave stale names behind for curriculum stage matching.
            # The owner's 'fresh' flag tells restored-run peers that a
            # restored slot now holds a known level again (so the
            # restored/slot-N mask must drop on EVERY host, not just
            # the owner's).
            names, fresh = self._allgather_slot_names()
            for g, name in enumerate(names):
                if off <= g < off + P:
                    continue  # own slots carry full local metadata
                if not fresh[g]:
                    continue  # owner can't vouch for a restored slot
                if self._restored_meta:
                    self._restored_meta.pop(g, None)
                if self._meta is not None:
                    self._meta.setdefault(g, {})["name"] = name
        elif kept:
            self.pool = target
        return len(kept)

    def _level_compatible(self, lv):
        """Whether a fresh level honors the pool's static guarantees
        (and its agent/exit padding)."""
        import numpy as np

        from ..core import cells as C
        from ..core.scoring import rows_packable
        from ..env.state import goals_are_static

        if lv.num_agents > self.pool.agent_locs.shape[-2]:
            return False
        n_exits = int(((lv.board & (C.EXIT | C.AGENT)) == C.EXIT).sum())
        if n_exits > self.pool.exit_locs.shape[-2]:
            return False
        if self.pool.spawner_free and bool(
                ((lv.board | lv.goals) & C.SPAWNING).any()):
            return False
        if self.pool.all_goals_static and not goals_are_static(lv.goals):
            return False
        if self.pool.rows_packed and not rows_packable(
                np.asarray(lv.points_table)):
            return False
        return True


# ---------------------------------------------------------------------------
# Archive tooling (parity: reference level_iterator.py:290-357)


def gen_many(param_file, out_dir, num_gen, num_workers=8, seed=None):
    """Generate ``num_gen`` levels from a procgen param file into
    ``out_dir`` as individual ``<basename>-NNN.npz`` files.

    Existing files are kept (resumable), like the reference's generator.
    """
    out_dir = os.path.abspath(out_dir)
    base_name = os.path.basename(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    digits = len(str(num_gen))
    it = SafeLifeLevelIterator(param_file, num_workers=num_workers,
                               seed=seed)
    for k in range(1, num_gen + 1):
        fname = os.path.join(
            out_dir, "%s-%0*d.npz" % (base_name, digits, k))
        lv = next(it)  # always consume: a resumed seeded run must keep
        if os.path.exists(fname):   # the stream aligned with file indices
            continue
        L.save_level(lv, fname)


def combine_levels(directory, out_file=None):
    """Merge every single-level ``.npz`` in ``directory`` into one archive
    (structured array under key ``levels``, reference-compatible)."""
    import glob

    files = sorted(glob.glob(os.path.join(directory, "*.npz")))
    if not files:
        raise FileNotFoundError("no .npz levels in %s" % directory)
    levels = []
    for f in files:
        lv = L.load_levels(f)[0]
        lv.name = os.path.basename(f)
        levels.append(lv)
    out_file = out_file or directory.rstrip("/") + ".npz"
    L.save_archive(levels, out_file)
    return out_file


def expand_levels(file_name, out_dir=None):
    """Opposite of :func:`combine_levels`: split an archive into files."""
    out_dir = out_dir or file_name[:-4]
    os.makedirs(out_dir, exist_ok=True)
    for lv in L.load_levels(file_name):
        name = lv.name if lv.name.endswith(".npz") else lv.name + ".npz"
        L.save_level(lv, os.path.join(out_dir, os.path.basename(name)))
    return out_dir


BENCHMARK_TASKS = (
    "append-still", "append-dynamic", "append-spawn",
    "prune-dynamic", "prune-spawn", "prune-still", "prune-still-hard",
    "navigation",
)


def gen_benchmarks(out_dir=None, tasks=BENCHMARK_TASKS, num=100,
                   seed=20260816, num_workers=8):
    """Generate the fixed benchmark archives (parity:
    ``gen_benchmarks``, reference level_iterator.py:344-357): ``num``
    frozen levels per task, packed one archive per task under
    ``<levels>/benchmarks/v1/`` (fresh archives for new specs; the
    canonical suite is the packaged frozen v1.0). Deterministic given
    ``seed``.
    """
    out_dir = out_dir or os.path.join(L.LEVEL_DIRECTORY, "benchmarks", "v1")
    os.makedirs(out_dir, exist_ok=True)
    root = np.random.SeedSequence(seed)
    outs = []
    for task, task_seed in zip(tasks, root.spawn(len(tasks))):
        out_file = os.path.join(out_dir, task + ".npz")
        if os.path.exists(out_file):
            outs.append(out_file)
            continue
        it = SafeLifeLevelIterator("random/" + task, seed=task_seed,
                                   num_workers=num_workers)
        levels = []
        for i in range(num):
            lv = next(it)
            lv.name = "%s-%03d.npz" % (task, i + 1)
            levels.append(lv)
        L.save_archive(levels, out_file)
        outs.append(out_file)
    return outs


def _swap_rows(pool, fresh, idx):
    """Jitted row replacement: pool rows ``idx`` <- fresh rows."""
    import jax

    global _swap_rows_jit
    try:
        fn = _swap_rows_jit
    except NameError:
        fn = _swap_rows_jit = jax.jit(
            lambda p, f, i: jax.tree.map(
                lambda a, b: a.at[i].set(b), p, f))
    return fn(pool, fresh, idx)
