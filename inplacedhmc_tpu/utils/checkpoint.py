"""Checkpoint / resume between warmup stages.

The reference has no checkpointing (``mcmc_with_warmup`` runs to completion in
one call, ``mcmc.jl:94-106``), but its explicit ``WarmupState`` is a complete
resume point between stages (SURVEY.md §5).  Here that observation becomes a
feature: ``(rng_key, WarmupState, stage index)`` is serialized after every
warmup stage, so a preempted multi-hour run restarts at the last finished
stage — the standard TPU-pod failure-handling model (orchestrator restart +
checkpoint, no in-job elasticity).
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.metric import DenseMetric, DiagMetric, LowRankMetric
from ..core.state import EvalPoint, WarmupState
from ..parallel.multiprocess import per_process_path, to_host


def save_warmup_checkpoint(path: str, state: WarmupState, key, stage_idx: int):
    """Atomically write the warmup state to ``path`` (.npz).

    Multi-process runs: every process writes its *own* file
    (``per_process_path``) holding its local chain rows — hosts never race on
    one file, and each host's payload is O(local chains), not O(global)."""
    path = per_process_path(path)
    metric = state.metric
    if isinstance(metric, DiagMetric):
        kind, inv, aux = "diag", metric.inv, metric.sqrt_mass
    elif isinstance(metric, DenseMetric):
        kind, inv, aux = "dense", metric.inv, metric.mass_chol
    else:
        kind, inv, aux = "low_rank", metric.diag_inv, metric.u
    payload = {
        "q": to_host(state.z.q),
        "logp": to_host(state.z.logp),
        "grad": to_host(state.z.grad),
        "key": to_host(key),
        "stage_idx": np.asarray(stage_idx),
        "metric_kind": np.asarray(kind),
        "metric_inv": to_host(inv),
        "metric_aux": to_host(aux),
        "has_eps": np.asarray(state.log_eps is not None),
    }
    if isinstance(metric, LowRankMetric):
        payload["metric_w"] = to_host(metric.w)
    if state.log_eps is not None:
        payload["log_eps"] = to_host(state.log_eps)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)


def load_warmup_checkpoint(path: str) -> Tuple[WarmupState, jnp.ndarray, int]:
    """Load ``(state, key, stage_idx)`` written by :func:`save_warmup_checkpoint`.
    Multi-process: reads this process's file; the returned arrays hold LOCAL
    chain rows — re-globalize with
    :func:`~inplacedhmc_tpu.parallel.multiprocess.tree_make_global_like`
    (the driver does, ``warmup_with_checkpoints``)."""
    with np.load(per_process_path(path), allow_pickle=False) as z:
        ev = EvalPoint(q=jnp.asarray(z["q"]), logp=jnp.asarray(z["logp"]),
                       grad=jnp.asarray(z["grad"]))
        kind = str(z["metric_kind"])
        if kind == "diag":
            metric = DiagMetric(inv=jnp.asarray(z["metric_inv"]),
                                sqrt_mass=jnp.asarray(z["metric_aux"]))
        elif kind == "low_rank":
            metric = LowRankMetric(diag_inv=jnp.asarray(z["metric_inv"]),
                                   u=jnp.asarray(z["metric_aux"]),
                                   w=jnp.asarray(z["metric_w"]))
        else:
            metric = DenseMetric(inv=jnp.asarray(z["metric_inv"]),
                                 mass_chol=jnp.asarray(z["metric_aux"]))
        log_eps = jnp.asarray(z["log_eps"]) if bool(z["has_eps"]) else None
        key = jnp.asarray(z["key"])
        stage_idx = int(z["stage_idx"])
    return WarmupState(z=ev, metric=metric, log_eps=log_eps), key, stage_idx


def _blocks_dir(path: str) -> str:
    return path + ".blocks"


def append_sampling_block(path: str, start: int, count: int, blk):
    """Persist ONE completed sampling block (its draws + tree stats) under
    ``<path>.blocks/block_<start>.npz``.  Incremental by design: each block is
    fetched from device and written once, so checkpointing cost is O(block)
    per block instead of O(run so far) per save — the legacy all-blocks
    re-save was quadratic in run length and, through a remote-attached
    runtime (TPU tunnel), dominated wall time for long runs.

    An existing file at the same start (a crash-replayed block: written after
    the last state save, so the replay regenerates it bit-identically from
    the checkpointed RNG stream) is atomically overwritten.

    Returns the block as a HOST (numpy) ``SamplingResult`` (``z=None``,
    ``moments=None``) so the caller can drop its device copy — accumulating
    hundreds of live device buffers over a long run degrades remote-attached
    runtimes."""
    from ..adapt.warmup import SamplingResult
    from ..core.state import TreeStats

    path = per_process_path(path)
    draws = to_host(blk.draws)
    stats = TreeStats(**{n: to_host(getattr(blk.stats, n))
                         for n in blk.stats._fields})
    host = SamplingResult(z=None, draws=draws, stats=stats)
    d = _blocks_dir(path)
    os.makedirs(d, exist_ok=True)
    fname = os.path.join(d, f"block_{start:08d}.npz")
    payload = {"start": np.asarray(start), "count": np.asarray(count),
               "draws": draws}
    for name in stats._fields:
        payload["stat_" + name] = getattr(stats, name)
    tmp = fname + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, fname)
    return host


def _block_files(path: str):
    """``[(start, filename)]`` for the checkpoint's block dir, ordered by
    start (numeric, NOT lexicographic — fixed-width names would misorder
    past their digit budget)."""
    d = _blocks_dir(path)
    names = os.listdir(d) if os.path.isdir(d) else []
    out = []
    for name in names:
        if name.startswith("block_") and name.endswith(".npz"):
            out.append((int(name[6:-4]), os.path.join(d, name)))
    return sorted(out)


def _reset_blocks_dir(path: str) -> None:
    """Delete any ``<path>.blocks/`` leftovers.  Called when a run starts
    FRESH (no state file): stale block files from a previous run at the same
    path would otherwise be trusted by the next resume and silently replace
    the new run's draws."""
    for _, fname in _block_files(path):
        os.remove(fname)


def _load_blocks(path: str, done: int):
    """Read the per-block files covering draws ``[0, done)`` as host
    ``SamplingResult``s.  Files at or past ``done`` (appended after the last
    state save) are DELETED: the replay regenerates that range, and its block
    boundaries may differ from the crashed run's (a resume may use another
    ``draw_block``), so stale files must not survive to overlap the replay's.
    Raises if the kept files do not tile ``[0, done)`` contiguously (can only
    happen if a block file was deleted by hand)."""
    from ..adapt.warmup import SamplingResult
    from ..core.state import TreeStats

    blocks, covered = [], 0
    for start, fname in _block_files(path):
        if start >= done:
            os.remove(fname)
            continue
        if start != covered:
            raise RuntimeError(
                f"sampling checkpoint {path!r} is missing blocks: expected "
                f"draw {covered}, found block at {start}")
        with np.load(fname, allow_pickle=False) as f:
            stats = TreeStats(**{n: np.asarray(f["stat_" + n])
                                 for n in TreeStats._fields})
            blocks.append(SamplingResult(z=None, draws=np.asarray(f["draws"]),
                                         stats=stats))
            covered = start + int(f["count"])
    if covered != done:
        raise RuntimeError(
            f"sampling checkpoint {path!r} covers {covered} draws, state "
            f"says {done}")
    return blocks


def save_sampling_checkpoint(path: str, z: EvalPoint, key, done: int):
    """Atomically checkpoint mid-sampling progress: current phase point, RNG
    key and number of draws completed (the ``draw_block`` loop is the natural
    checkpoint boundary for long sampling runs — the reference runs to
    completion in one call, ``mcmc.jl:94-106``, and cannot resume).  Draw
    blocks themselves are persisted incrementally by
    :func:`append_sampling_block`."""
    path = per_process_path(path)
    payload = {
        "q": to_host(z.q), "logp": to_host(z.logp),
        "grad": to_host(z.grad), "key": to_host(key),
        "done": np.asarray(done),
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)


def load_sampling_checkpoint(path: str):
    """Load a sampling checkpoint; returns ``(z, key, done, blocks)`` or
    ``None`` if the file does not exist.  Reads both the incremental format
    (state file + ``<path>.blocks/`` dir) and the legacy single-file format
    (all draws in the state file); a legacy load rewrites its merged draws as
    ``block_00000000.npz`` so subsequent incremental saves stay consistent."""
    from ..adapt.warmup import SamplingResult
    from ..core.state import TreeStats

    path = per_process_path(path)
    if not os.path.exists(path):
        _reset_blocks_dir(path)  # stale blocks from a previous run here
        return None
    with np.load(path, allow_pickle=False) as f:
        z = EvalPoint(q=jnp.asarray(f["q"]), logp=jnp.asarray(f["logp"]),
                      grad=jnp.asarray(f["grad"]))
        key, done = jnp.asarray(f["key"]), int(f["done"])
        if "draws" in f:  # legacy: one file holding every block so far
            stats = TreeStats(**{name: np.asarray(f["stat_" + name])
                                 for name in TreeStats._fields})
            block = SamplingResult(z=None, draws=np.asarray(f["draws"]),
                                   stats=stats)
            append_sampling_block(path, 0, done, block)
            return z, key, done, [block]
    return z, key, done, _load_blocks(path, done)


def _acov_payload(prefix, a, payload):
    payload[prefix + "qref"] = to_host(a.qref)
    payload[prefix + "ring"] = to_host(a.ring)
    payload[prefix + "s1"] = to_host(a.s1)
    payload[prefix + "lag"] = to_host(a.lag)
    payload[prefix + "cnt_lag"] = to_host(a.cnt_lag)
    payload[prefix + "cnt"] = to_host(a.cnt)


def _acov_load(prefix, f):
    from ..sketch import AutocovSketch
    return AutocovSketch(qref=jnp.asarray(f[prefix + "qref"]),
                         ring=jnp.asarray(f[prefix + "ring"]),
                         s1=jnp.asarray(f[prefix + "s1"]),
                         lag=jnp.asarray(f[prefix + "lag"]),
                         cnt_lag=jnp.asarray(f[prefix + "cnt_lag"]),
                         cnt=jnp.asarray(f[prefix + "cnt"]))


def save_lean_checkpoint(path: str, z: EvalPoint, key, done: int,
                         mom=None, sketch=None):
    """Checkpoint a streaming-accumulator (``collect_moments`` /
    ``collect_sketch``) sampling run: phase point, RNG key, progress and the
    accumulator pytrees — the long-run / lean-memory analog of
    :func:`save_sampling_checkpoint`.  Draw/stat blocks are persisted
    incrementally by :func:`append_sampling_block` (draws may be zero-width
    in ``store_draws=False`` mode), so this save is O(C·D) regardless of how
    long the run is."""
    path = per_process_path(path)
    payload = {
        "q": to_host(z.q), "logp": to_host(z.logp),
        "grad": to_host(z.grad), "key": to_host(key),
        "done": np.asarray(done),
        "has_mom": np.asarray(mom is not None),
        "has_sketch": np.asarray(sketch is not None),
    }
    if mom is not None:
        payload.update(mom_qref=to_host(mom.qref), mom_cnt=to_host(mom.cnt),
                       mom_s1=to_host(mom.s1), mom_s2=to_host(mom.s2))
    if sketch is not None:
        rk = sketch.rank
        payload.update(rk_lo=to_host(rk.lo), rk_width=to_host(rk.width),
                       rk_counts=to_host(rk.counts))
        _acov_payload("ac_", sketch.acov, payload)
        payload["has_tail"] = np.asarray(sketch.tail is not None)
        if sketch.tail is not None:
            t = sketch.tail
            payload.update(tail_q05=to_host(t.q05), tail_q95=to_host(t.q95),
                           tail_start=to_host(t.start))
            _acov_payload("tlo_", t.lo, payload)
            _acov_payload("thi_", t.hi, payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)


def load_lean_checkpoint(path: str):
    """Load a lean checkpoint; returns ``(z, key, done, blocks, mom, sketch)``
    or ``None`` if the file does not exist.  Reads both the incremental
    format (state file + ``<path>.blocks/``) and the legacy single-file
    format; a legacy load rewrites its merged draws as ``block_00000000.npz``
    so subsequent incremental saves stay consistent."""
    from ..adapt.warmup import SamplingResult, SplitMoments
    from ..core.state import TreeStats
    from ..sketch import RankHistSketch, StreamSketch, TailSketch

    path = per_process_path(path)
    if not os.path.exists(path):
        _reset_blocks_dir(path)  # stale blocks from a previous run here
        return None
    with np.load(path, allow_pickle=False) as f:
        z = EvalPoint(q=jnp.asarray(f["q"]), logp=jnp.asarray(f["logp"]),
                      grad=jnp.asarray(f["grad"]))
        done = int(f["done"])
        if "draws" in f:  # legacy: one file holding every block so far
            stats = TreeStats(**{name: np.asarray(f["stat_" + name])
                                 for name in TreeStats._fields})
            blocks = [SamplingResult(z=None, draws=np.asarray(f["draws"]),
                                     stats=stats)]
            append_sampling_block(path, 0, done, blocks[0])
        else:
            blocks = _load_blocks(path, done)
        mom = None
        if bool(f["has_mom"]):
            mom = SplitMoments(qref=jnp.asarray(f["mom_qref"]),
                               cnt=jnp.asarray(f["mom_cnt"]),
                               s1=jnp.asarray(f["mom_s1"]),
                               s2=jnp.asarray(f["mom_s2"]))
        sketch = None
        if bool(f["has_sketch"]):
            # (older checkpoints also stored a redundant rk_cnt counter;
            # per-half counts are sums over rk_counts, so it is ignored)
            rank = RankHistSketch(lo=jnp.asarray(f["rk_lo"]),
                                  width=jnp.asarray(f["rk_width"]),
                                  counts=jnp.asarray(f["rk_counts"]))
            tail = None
            if bool(f["has_tail"]):
                tail = TailSketch(q05=jnp.asarray(f["tail_q05"]),
                                  q95=jnp.asarray(f["tail_q95"]),
                                  lo=_acov_load("tlo_", f),
                                  hi=_acov_load("thi_", f),
                                  start=jnp.asarray(f["tail_start"]))
            sketch = StreamSketch(rank=rank, acov=_acov_load("ac_", f),
                                  tail=tail)
        return z, jnp.asarray(f["key"]), done, blocks, mom, sketch


def warmup_with_checkpoints(kernel, key, state: WarmupState, stages,
                            path: str, reporter=None, tuning_chunk=None):
    """Run ``kernel``'s warmup stage-by-stage, checkpointing after each stage
    and resuming from ``path`` if it exists.  Returns ``(state, warmup_stats)``
    (stats only from stages run in this process)."""
    start = 0
    if os.path.exists(per_process_path(path)):
        like = state
        state, key, start = load_warmup_checkpoint(path)
        if jax.process_count() > 1:
            # per-process files hold local chain rows; rebuild global arrays
            # with the incoming (sharded) state's mesh
            from ..parallel.multiprocess import (make_global_by_shape,
                                                 reglobalize_resume)
            n_chains = like.z.q.shape[0]
            state = WarmupState(
                z=reglobalize_resume(state.z, like.z.q, n_chains),
                metric=reglobalize_resume(state.metric, like.z.q, n_chains),
                log_eps=reglobalize_resume(state.log_eps, like.z.q, n_chains))
    warmup_stats = []
    stages = list(stages)
    for idx in range(start, len(stages)):
        key, sub = jax.random.split(key)
        state, stats = kernel.warmup(sub, state, [stages[idx]], reporter,
                                     tuning_chunk=tuning_chunk)
        warmup_stats.extend(stats)
        save_warmup_checkpoint(path, state, key, idx + 1)
    return state, warmup_stats
