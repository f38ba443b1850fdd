"""Multi-process (multi-host) execution scaffolding.

The reference's multi-chain driver is one OS thread per chain inside a single
process (``/root/reference/src/mcmc.jl:130-159``); its platform has no
multi-host story.  On a TPU pod the equivalent scale-out is one *process per
host*, all participating in a single global device mesh: every process runs
the same driver, jitted stages execute collectively over GSPMD-sharded global
arrays, and the only host-side asymmetries are (a) progress reporting — the
coordinator only, (b) checkpoint I/O — each process persists its *local* chain
rows (per-host block files), and (c) result fetching — host-side numpy views
cover the local shard.

This module provides those asymmetries plus the
``jax.distributed.initialize`` entry point.  It is a no-op layer in
single-process runs: every helper degrades to the identity, so the
single-host driver path is byte-identical with or without it.

Launch recipe: docs/MULTIHOST.md.  A real 2-process rehearsal runs in CI on
the CPU backend (Gloo collectives): ``tests/test_multiprocess.py``.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids=None, **kw) -> None:
    """Join the global device mesh (``jax.distributed.initialize`` wrapper).

    Call once per process before any backend use.  On TPU pods created
    through standard tooling every argument is auto-detected from the
    environment and ``initialize()`` suffices; on hand-rolled clusters (or
    the CPU rehearsal) pass ``coordinator_address='host0:port'``,
    ``num_processes`` and ``process_id`` explicitly.  Safe to call in a
    single-process run with no arguments only when the environment provides
    cluster auto-detection; otherwise skip it — every helper below already
    degrades to the single-process identity.
    """
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids, **kw)


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_coordinator() -> bool:
    """True on the process that owns logging and shared-metadata writes."""
    return jax.process_index() == 0


def per_process_path(path: str) -> str:
    """Route a checkpoint path to a per-process file (``x.npz`` →
    ``x.proc3.npz``) so hosts never race on one file.  Identity when
    single-process, so existing single-host checkpoints stay valid."""
    if jax.process_count() == 1:
        return path
    root, ext = os.path.splitext(path)
    tag = f".proc{jax.process_index()}"
    if root.endswith(tag):  # idempotent: callers may route nested paths
        return path
    return f"{root}{tag}{ext}"


def _sharded_axes(x) -> list:
    """Axes of ``x`` that are split across devices (from the first shard's
    index structure)."""
    shards = x.addressable_shards
    if not shards:
        return []
    axes = []
    for ax, idx in enumerate(shards[0].index):
        if isinstance(idx, slice) and (idx.start not in (None, 0)
                                       or (idx.stop is not None
                                           and idx.stop != x.shape[ax])):
            axes.append(ax)
    # the first shard may start at 0 on a sharded axis; detect via any shard
    for ax in range(x.ndim):
        if ax in axes:
            continue
        starts = {(s.index[ax].start or 0) for s in shards}
        if len(starts) > 1:
            axes.append(ax)
    return sorted(axes)


def host_local_rows(x):
    """This process's contiguous rows of a global array as host numpy, plus
    the global offset of the first row.

    Requires the array be sharded over at most ONE axis (the chain axis in
    every sampler state leaf) with this process owning a contiguous row
    range — exactly what ``shard_state``'s chain sharding produces.  Fully
    replicated (or single-process) arrays return ``(np.asarray(x), 0)``.
    """
    if not isinstance(x, jax.Array) or x.is_fully_addressable:
        return np.asarray(x), 0
    axes = _sharded_axes(x)
    if not axes:  # replicated across processes
        return np.asarray(x.addressable_shards[0].data), 0
    assert len(axes) == 1, (
        f"host_local_rows supports one sharded axis, found {axes} "
        f"(shape {x.shape})")
    ax = axes[0]
    shards = sorted(x.addressable_shards,
                    key=lambda s: s.index[ax].start or 0)
    # deduplicate replicas of the same row range (e.g. a 2-D mesh where the
    # other axis replicates)
    seen, parts = set(), []
    for s in shards:
        start = s.index[ax].start or 0
        if start in seen:
            continue
        seen.add(start)
        parts.append((start, np.asarray(s.data)))
    offset = parts[0][0]
    want = offset
    for start, data in parts:
        assert start == want, (
            f"process rows are not contiguous on axis {ax}: expected "
            f"{want}, got {start}")
        want = start + data.shape[ax]
    return np.concatenate([p for _, p in parts], axis=ax), offset


def to_host(x) -> np.ndarray:
    """Host numpy of ``x``: the whole array when addressable, this process's
    local rows otherwise (the per-host checkpoint payload)."""
    return host_local_rows(x)[0]


def make_global_like(local, like) -> jax.Array:
    """Assemble a global array from per-process local rows, with ``like``'s
    sharding (the resume-path inverse of :func:`to_host`).  Identity
    passthrough single-process."""
    if jax.process_count() == 1 or not isinstance(like, jax.Array):
        return jnp.asarray(local)
    return jax.make_array_from_process_local_data(like.sharding,
                                                  np.asarray(local))


def tree_make_global_like(local_tree, like_tree):
    return jax.tree_util.tree_map(make_global_like, local_tree, like_tree)


def make_global_by_shape(tree, mesh, n_chains_global: int,
                         chain_axis: str = "chain"):
    """Per-process local checkpoint rows → global sharded arrays.

    In each leaf, the first axis whose size equals this process's local chain
    count (``n_chains_global / process_count``) shards over ``chain_axis``;
    every other leaf (and axis) is treated as replicated — matching what
    :func:`~inplacedhmc_tpu.parallel.mesh.shard_state` produced on the way
    in and :func:`to_host` wrote on the way out.  Identity single-process.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    if jax.process_count() == 1:
        return jax.tree_util.tree_map(jnp.asarray, tree)
    n_local = n_chains_global // jax.process_count()

    def put(x):
        x = np.asarray(x)
        names, used = [], False
        for s in x.shape:
            if not used and s == n_local:
                names.append(chain_axis)
                used = True
            else:
                names.append(None)
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P(*names)), x)

    return jax.tree_util.tree_map(put, tree)


def reglobalize_resume(tree, like_q, n_chains_global: int):
    """Resume-path helper: re-globalize a checkpoint-loaded pytree using the
    mesh and chain-axis name carried by a reference sharded array (the
    run's initial ``state.z.q``).  No-op single-process."""
    if jax.process_count() == 1 or tree is None:
        return tree
    sharding = like_q.sharding
    axis = next(a for a in sharding.spec if a is not None)
    return make_global_by_shape(tree, sharding.mesh, n_chains_global,
                                chain_axis=axis)


def coordinator_only(reporter):
    """Progress reporting from the coordinator only (every process runs the
    same driver loop; N identical progress streams help nobody)."""
    from ..report import NoProgressReport
    if reporter is None or not is_coordinator():
        return NoProgressReport() if not is_coordinator() else reporter
    return reporter
