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
                reporter=None, axis_name: str = "chain"):
    """Full warmup + sampling with chains sharded over ``mesh``.

    Uses the GSPMD path: the initial state is placed with chain sharding and
    every jitted warmup/sampling block is partitioned by XLA; pooled
    adaptation reductions become global collectives automatically.  Requires
    ``n_chains % mesh.size == 0``.
    """
    from ..config import NUTS, DualAveraging, default_warmup_stages
    from ..adapt import warmup as W
    from ..sample import MCMCResult, _kernel
    from ..core.state import WarmupState

    assert n_chains % mesh.size == 0, (
        f"n_chains={n_chains} must divide evenly over {mesh.size} devices")
    algorithm = algorithm or NUTS()
    if warmup_stages is None:
        warmup_stages = default_warmup_stages(
            stepsize_adaptation=DualAveraging(delta=delta))

    # pooled adaptation; GSPMD inserts the collectives.  Pallas kernels do
    # not auto-partition under GSPMD, so the sharded path uses the XLA tree.
    kern = _kernel(model, algorithm, True, None, use_pallas="off")
    key, k_init, k_warm, k_sample = jax.random.split(key, 4)
    state = W.init_warmup_state(k_init, kern.potential, model.dim, n_chains,
                                dtype, q=q, metric=metric, eps=eps)
    state = shard_by_chain(state, mesh, n_chains, axis_name)
    with mesh:
        state, warmup_stats = kern.warmup(k_warm, state, warmup_stages, reporter)
        out = kern._sampling_fn(n_draws)(k_sample, state)
    ws = None
    if warmup_stats:
        ws = jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs, axis=0),
                                    *warmup_stats)
    final_state = WarmupState(z=out.z, metric=state.metric, log_eps=state.log_eps)
    return MCMCResult(draws=out.draws, stats=out.stats,
                      warmup_state=final_state, warmup_stats=ws)
