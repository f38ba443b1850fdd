"""Explicit-collective cross-device diagnostics and reductions.

The ``shard_map`` counterpart of the GSPMD path in ``mesh.py``: these
functions take a *local* shard of chains (``[N, C_local, D]``) inside a
``shard_map`` region and combine across the ``'chain'`` mesh axis with
``lax.psum`` — R-hat and ESS over every chain on every device without ever
gathering the draws (the north-star collective capability; the reference has
no distributed backend at all, SURVEY.md §5).

Each chain lives entirely on one device (chains are sharded, draws are not),
so per-chain statistics (means, variances, autocovariances) are local; only
O(D) moment vectors cross the ICI.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ..diagnostics import _autocov_fft, _geyer_tau


def _psum(x, axis_name):
    return lax.psum(x, axis_name) if axis_name is not None else x


def _split_chains(draws):
    n = draws.shape[0]
    half = n // 2
    return jnp.concatenate([draws[:half], draws[half:2 * half]], axis=1), half


def split_rhat_sharded(draws_local: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Split-R̂ over all chains on all devices.  ``draws_local``: [N, C_loc, D].

    Communicates only four [D] vectors (counts + three moment sums).
    """
    x, half = _split_chains(draws_local)
    m_local = x.shape[1]
    chain_mean = jnp.mean(x, axis=0)          # [2C_loc, D]
    chain_var = jnp.var(x, axis=0, ddof=1)    # [2C_loc, D]

    m = _psum(jnp.asarray(m_local, x.dtype), axis_name)
    s1 = _psum(jnp.sum(chain_mean, axis=0), axis_name)
    w = _psum(jnp.sum(chain_var, axis=0), axis_name) / m

    # centered second moment across chain means: the one-pass
    # s2 - m*grand^2 form cancels catastrophically in f32 at |mean|/sd ~ 4e3
    grand_mean = s1 / m
    cm = chain_mean - grand_mean
    s2c = _psum(jnp.sum(cm * cm, axis=0), axis_name)
    b = half * s2c / (m - 1)
    var_plus = (half - 1) / half * w + b / half
    return jnp.sqrt(var_plus / w)


def ess_bulk_sharded(draws_local: jnp.ndarray, axis_name: str,
                     cap: bool = True) -> jnp.ndarray:
    """Bulk ESS over all chains on all devices (Geyer monotone sequence).

    Autocovariances are per-chain and therefore local; only their [half, D]
    cross-chain mean and the moment vectors are psum-combined.
    """
    x, half = _split_chains(draws_local)
    m_local = x.shape[1]
    acov = _autocov_fft(x)                                    # [half, 2C_loc, D]

    m = _psum(jnp.asarray(m_local, x.dtype), axis_name)
    acov_mean = _psum(jnp.sum(acov, axis=1), axis_name) / m   # [half, D]
    chain_var = acov[0] * half / (half - 1)
    w = _psum(jnp.sum(chain_var, axis=0), axis_name) / m      # [D]
    chain_mean = jnp.mean(x, axis=0)
    s1 = _psum(jnp.sum(chain_mean, axis=0), axis_name)
    grand_mean = s1 / m
    cm = chain_mean - grand_mean  # centered: see split_rhat_sharded
    s2c = _psum(jnp.sum(cm * cm, axis=0), axis_name)
    b = half * s2c / (m - 1)
    var_plus = (half - 1) / half * w + b / half

    rho = 1.0 - (w[None] - acov_mean) / var_plus[None]        # [half, D]
    tau = _geyer_tau(rho)
    total = m * half
    ess = total / tau
    return jnp.minimum(ess, total) if cap else ess


def pooled_acceptance(accept_local: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Cross-device mean acceptance for shared dual averaging.  The count is
    the local SIZE (the sum reduces every axis; counting only shape[0] would
    inflate the mean for [N, C_local] inputs by the chain factor)."""
    s = _psum(jnp.sum(accept_local), axis_name)
    n = _psum(jnp.asarray(accept_local.size, accept_local.dtype), axis_name)
    return s / n
