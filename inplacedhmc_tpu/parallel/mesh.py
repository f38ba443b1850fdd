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


def chain_spec(mesh: Mesh, ndim: int, axis_name: str = "chain") -> NamedSharding:
    """Sharding for a ``[C, ...]`` array: chains split over the mesh axis."""
    return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_by_chain(tree, mesh: Mesh, n_chains: int, axis_name: str = "chain"):
    """device_put a pytree: leaves whose leading dim equals ``n_chains`` are
    sharded over the chain axis, everything else replicated."""

    def put(x):
        x = jnp.asarray(x)
        if x.ndim >= 1 and x.shape[0] == n_chains:
            return jax.device_put(x, chain_spec(mesh, x.ndim, axis_name))
        return jax.device_put(x, replicated(mesh))

    return jax.tree_util.tree_map(put, tree)


def run_sharded(key, model, n_draws: int, n_chains: int, *, mesh: Mesh,
                delta: float = 0.8, algorithm=None, warmup_stages=None,
                dtype=jnp.float32, q=None, metric=None, eps=None,
                reporter=None, axis_name: str = "chain", thin: int = 1,
                draw_block=None, tuning_chunk=None, use_pallas: str = "auto",
                warmup_checkpoint_path=None, sample_checkpoint_path=None,
                keep_dims=None, collect_moments: bool = False,
                collect_sketch=None, store_draws: bool = True,
                sync_blocks: bool = False):
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
    """
    from ..config import NUTS, DualAveraging, default_warmup_stages
    from ..sample import _kernel

    assert n_chains % mesh.size == 0, (
        f"n_chains={n_chains} must divide evenly over {mesh.size} devices")
    algorithm = algorithm or NUTS()
    if warmup_stages is None:
        warmup_stages = default_warmup_stages(
            stepsize_adaptation=DualAveraging(delta=delta))

    kern = _kernel(model, algorithm, True, None, use_pallas=use_pallas,
                   shard_mesh=mesh, shard_axis=axis_name)
    with mesh:
        return kern.run(key, n_draws, n_chains, warmup_stages=warmup_stages,
                        dtype=dtype, reporter=reporter, thin=thin,
                        draw_block=draw_block, tuning_chunk=tuning_chunk,
                        q=q, metric=metric, eps=eps,
                        state_transform=lambda st: shard_by_chain(
                            st, mesh, n_chains, axis_name),
                        warmup_checkpoint_path=warmup_checkpoint_path,
                        sample_checkpoint_path=sample_checkpoint_path,
                        keep_dims=keep_dims, collect_moments=collect_moments,
                        collect_sketch=collect_sketch,
                        store_draws=store_draws,
                        sync_blocks=sync_blocks)
