"""Device-mesh chain sharding (GSPMD path).

The reference's only parallelism is one OS thread per chain with zero
cross-chain communication (``/root/reference/src/mcmc.jl:150-156``).  The
TPU-native replacement (SURVEY.md §2 "parallelism inventory"):

* on-chip chain parallelism is ``vmap`` (already everywhere);
* across chips/hosts, chains shard over a named mesh axis ``'chain'`` with
  ``jax.sharding.NamedSharding`` — XLA/GSPMD partitions every jitted stage
  and **automatically inserts psum/all-gather collectives over ICI** for the
  pooled cross-chain reductions (mean acceptance for shared dual averaging,
  pooled mass-matrix moments, R-hat/ESS), because those reductions are plain
  ``jnp.mean``/``jnp.sum`` over the sharded chains axis;
* an explicit ``shard_map`` + ``lax.psum`` path lives in ``collectives.py``
  for kernels that want manual control.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_chain_mesh(n_devices: Optional[int] = None,
                    axis_name: str = "chain",
                    devices: Optional[Sequence] = None) -> Mesh:
    """A 1-D mesh over all (or the first ``n_devices``) devices."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def make_data_chain_mesh(n_data: int, n_chain: int,
                         data_axis: str = "data", chain_axis: str = "chain",
                         devices: Optional[Sequence] = None) -> Mesh:
    """A 2-D ``(data, chain)`` mesh: observation-axis model-data sharding ×
    chain data-parallelism (SURVEY.md §2 C13's ``('data','chain')`` axes).

    Shard the model's data arrays over ``data_axis`` with
    :func:`shard_model_data` *before* building the model; captured arrays
    keep their committed sharding under jit, so the per-observation terms of
    ``logp``/``grad`` compute on the local data shard and GSPMD inserts the
    psum over ``data_axis`` for the total.  Chains shard over ``chain_axis``
    as usual.
    """
    devs = list(devices) if devices is not None else jax.devices()
    need = n_data * n_chain
    assert len(devs) >= need, f"need {need} devices, have {len(devs)}"
    grid = np.asarray(devs[:need]).reshape(n_data, n_chain)
    return Mesh(grid, (data_axis, chain_axis))


def shard_model_data(mesh: Mesh, *arrays, axis_name: str = "data"):
    """device_put data arrays with their leading (observation) axis sharded
    over ``axis_name`` — build the model from the returned arrays so its
    closure captures the sharded placement."""
    out = tuple(
        jax.device_put(jnp.asarray(a),
                       NamedSharding(mesh, P(axis_name,
                                             *([None] * (jnp.ndim(a) - 1)))))
        for a in arrays)
    return out if len(out) != 1 else out[0]


def make_chain_dim_mesh(n_chain: int, n_dim: int,
                        chain_axis: str = "chain", dim_axis: str = "dim",
                        devices: Optional[Sequence] = None) -> Mesh:
    """A 2-D ``(chain, dim)`` mesh: chain data-parallelism × within-model
    (TP-analog) sharding of the parameter dimension.

    The reference has no within-model parallelism (its D lives in SIMD lanes,
    ``PtrVector{P,T,L}``); on TPU large-D models (stoch-vol: 1k latents ×
    10k chains, SURVEY.md §2 "parallelism inventory") shard D over a second
    mesh axis so position/momentum/gradient buffers split across devices and
    the logp/turn-criterion reductions become psums over ``dim_axis`` —
    inserted automatically by GSPMD.  Lay the ``dim`` axis innermost so its
    collectives ride the fastest ICI links.
    """
    devs = list(devices) if devices is not None else jax.devices()
    need = n_chain * n_dim
    assert len(devs) >= need, f"need {need} devices, have {len(devs)}"
    grid = np.asarray(devs[:need]).reshape(n_chain, n_dim)
    return Mesh(grid, (chain_axis, dim_axis))


def chain_spec(mesh: Mesh, ndim: int, axis_name: str = "chain") -> NamedSharding:
    """Sharding for a ``[C, ...]`` array: chains split over the mesh axis."""
    return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_by_chain(tree, mesh: Mesh, n_chains: int, axis_name: str = "chain"):
    """device_put a pytree: leaves whose leading dim equals ``n_chains`` are
    sharded over the chain axis, everything else replicated."""
    return shard_state(tree, mesh, n_chains, chain_axis=axis_name)


def shard_state(tree, mesh: Mesh, n_chains: int, dim: Optional[int] = None,
                chain_axis: str = "chain", dim_axis: str = "dim"):
    """device_put a pytree with (chain, dim) sharding by shape matching.

    In each leaf, the first axis of size ``n_chains`` shards over
    ``chain_axis`` and (when ``dim`` is given and ``dim_axis`` is in the
    mesh) the first *other* axis of size ``dim`` shards over ``dim_axis``;
    everything else replicates.  Covers every sampler-state leaf: ``q/p/grad``
    ``[C, D]`` → ``P(chain, dim)``, checkpoint stacks ``[C, md+1, D]`` →
    ``P(chain, None, dim)``, diag metric ``[D]`` → ``P(dim)``, dense metric
    ``[D, D]`` → ``P(dim, None)``, scalars replicated.
    """
    has_dim = dim is not None and dim_axis in mesh.axis_names
    if has_dim:
        assert dim % mesh.shape[dim_axis] == 0, (
            f"dim={dim} must divide evenly over the {mesh.shape[dim_axis]}"
            f"-device '{dim_axis}' axis")

    def put(x):
        x = jnp.asarray(x)
        names = []
        used_chain = used_dim = False
        for s in x.shape:
            if not used_chain and s == n_chains:
                names.append(chain_axis)
                used_chain = True
            elif has_dim and not used_dim and s == dim:
                names.append(dim_axis)
                used_dim = True
            else:
                names.append(None)
        return jax.device_put(x, NamedSharding(mesh, P(*names)))

    return jax.tree_util.tree_map(put, tree)


def run_sharded(key, model, n_draws: int, n_chains: int, *, mesh: Mesh,
                delta: float = 0.8, algorithm=None, warmup_stages=None,
                dtype=jnp.float32, q=None, metric=None, eps=None,
                reporter=None, axis_name: str = "chain",
                dim_axis: str = "dim", thin: int = 1,
                draw_block=None, tuning_chunk=None, use_pallas: str = "auto",
                warmup_checkpoint_path=None, sample_checkpoint_path=None,
                keep_dims=None, collect_moments: bool = False,
                collect_sketch=None, store_draws: bool = True,
                sync_blocks: bool = False,
                checkpoint_throttle_s: float = 0.0,
                fused_opts=None, tree_opts=None, post_step=None,
                schedule=None):
    """Full warmup + sampling with chains sharded over ``mesh`` — same driver
    surface as the single-device path (``thin``, ``draw_block``,
    checkpointing; the reference's multi-chain driver has the full surface of
    the single-chain one, ``mcmc.jl:130-159``).

    Execution: the initial state is placed with chain sharding and every
    jitted warmup/sampling block is partitioned by XLA (GSPMD); pooled
    adaptation reductions become global collectives automatically.  Fused
    whole-transition Pallas kernels do not auto-partition under GSPMD, so
    when the model/metric qualify they run under an explicit ``shard_map``
    over the chain axis (one kernel invocation per device shard).  Requires
    ``n_chains % mesh.size == 0``.

    **Multi-process (multi-host)**: pass a mesh over the GLOBAL device set
    after ``parallel.multiprocess.initialize()`` and run this same call on
    every process (launch recipe: docs/MULTIHOST.md; 2-process CPU rehearsal:
    tests/test_multiprocess.py).  Per-host asymmetries are handled here:
    progress reporting comes from the coordinator only, checkpoints are
    per-process files holding each host's local chain rows, and — for
    checkpointed runs — ``result.draws``/``stats`` are this host's local rows
    (compute cross-chain summaries from the streamed ``sample_moments`` /
    ``sample_sketch``, which stay global + replicated).
    """
    from ..config import NUTS, DualAveraging, default_warmup_stages
    from ..sample import _kernel
    from .multiprocess import coordinator_only

    reporter = coordinator_only(reporter)

    n_chain_devs = (mesh.shape[axis_name]
                    if axis_name in mesh.axis_names else mesh.size)
    assert n_chains % n_chain_devs == 0, (
        f"n_chains={n_chains} must divide evenly over {n_chain_devs} "
        f"'{axis_name}' devices")
    # 2-D (chain, dim) mesh: also shard the parameter dimension (TP analog)
    dim = model.dim if dim_axis in mesh.axis_names else None
    algorithm = algorithm or NUTS()
    if warmup_stages is None:
        warmup_stages = default_warmup_stages(
            stepsize_adaptation=DualAveraging(delta=delta))

    # schedule="work_sorted" under a mesh: the Pallas transitions sort
    # per-shard inside shard_map (no cross-device collective); if the model
    # falls back to the XLA tree the argsort runs under GSPMD — still
    # correct, but it inserts a cross-device sort per transition
    kern = _kernel(model, algorithm, True, None, use_pallas=use_pallas,
                   shard_mesh=mesh, shard_axis=axis_name,
                   fused_opts=fused_opts, tree_opts=tree_opts,
                   post_step=post_step, schedule=schedule)
    with mesh:
        return kern.run(key, n_draws, n_chains, warmup_stages=warmup_stages,
                        dtype=dtype, reporter=reporter, thin=thin,
                        draw_block=draw_block, tuning_chunk=tuning_chunk,
                        q=q, metric=metric, eps=eps,
                        state_transform=lambda st: shard_state(
                            st, mesh, n_chains, dim,
                            chain_axis=axis_name, dim_axis=dim_axis),
                        warmup_checkpoint_path=warmup_checkpoint_path,
                        sample_checkpoint_path=sample_checkpoint_path,
                        keep_dims=keep_dims, collect_moments=collect_moments,
                        collect_sketch=collect_sketch,
                        store_draws=store_draws,
                        sync_blocks=sync_blocks,
                        checkpoint_throttle_s=checkpoint_throttle_s)
