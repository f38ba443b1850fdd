"""Stochastic volatility (BASELINE config 5, shrunk): large-D latent model,
chains sharded over the 8-device virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from inplacedhmc_tpu import diagnostics as diag
from inplacedhmc_tpu.config import DualAveraging, default_warmup_stages
from inplacedhmc_tpu.models import stoch_vol, synthetic_returns
from inplacedhmc_tpu.parallel.mesh import make_chain_mesh
from inplacedhmc_tpu.sample import sample


def test_stoch_vol_sharded_end_to_end():
    t = 100  # latent states (full config: 1000)
    returns = synthetic_returns(jax.random.PRNGKey(0), t, phi=0.95, s=0.2,
                                dtype=jnp.float64)
    model = stoch_vol(returns)
    assert model.dim == t + 2

    mesh = make_chain_mesh()
    stages = default_warmup_stages(
        local_optimization=None,  # latent-heavy: start from prior draws instead
        stepsize_adaptation=DualAveraging(delta=0.8),
        init_steps=30, middle_steps=25, doubling_stages=2, terminating_steps=20)
    res = sample(jax.random.PRNGKey(1), model, n_draws=200, n_chains=16,
                 mesh=mesh, warmup_stages=stages, dtype=jnp.float64)

    draws = np.asarray(res.draws)
    assert draws.shape == (200, 16, t + 2)
    assert np.all(np.isfinite(draws))
    # mixing sanity: the sampler moved and the latent vol stays in a sane range
    assert draws[..., 2:].std() > 0.05
    post = model.constrain(res.draws)
    h_mean = float(np.asarray(post["h"]).mean())
    assert -5.0 < h_mean < 5.0, h_mean
    # phi = tanh(raw) should lean positive (data generated with phi=0.95)
    phi = np.asarray(post["phi"])
    assert phi.mean() > 0.3, phi.mean()
    # divergence rate may be nonzero on this posterior but must not dominate
    assert diag.divergence_fraction(res.stats) < 0.5
