"""Shared-warm-state A/B: packed vs 3-pass logistic kernel sampling ESS/s.

Two fresh-warmup bench runs disagreed on ESS_min/s (1.98M packed vs 2.79M
high3) even though their gradient error class is measured-identical
(5.4e-4, benchmarks/logistic_precision_ab.json) and packed's wall is ~7%
faster — the schedule_ab lesson says eps-adaptation stochasticity between
independent warmups confounds fresh-run comparisons.  Method here: warm up
ONCE (packed kernel), then run sampling with each kernel variant from the
SAME warm state (same eps, same dense metric, same start positions) —
any ESS/s difference is then attributable to the kernel itself.

Run: python benchmarks/logistic_bwd_ab.py
Writes benchmarks/logistic_bwd_ab.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from inplacedhmc_tpu import diagnostics as diag
    from inplacedhmc_tpu.config import DualAveraging, NUTS, default_warmup_stages
    from inplacedhmc_tpu.models import logistic_regression, synthetic_data
    from inplacedhmc_tpu.sample import _kernel
    import inplacedhmc_tpu.adapt.warmup as W

    n_chains, n_obs, n_feat, n_draws = 8192, 10_000, 50, 256
    dtype = jnp.float32
    x, y, _ = synthetic_data(jax.random.PRNGKey(0), n_obs, n_feat, dtype)
    model = logistic_regression(x, y)
    stages = default_warmup_stages(
        stepsize_adaptation=DualAveraging(),
        init_steps=50, middle_steps=50, doubling_stages=2,
        terminating_steps=50, metric="dense")

    kern_packed = _kernel(model, NUTS(), True, None,
                          fused_opts={"fwd_precision": "packed"})
    kern_high3 = _kernel(model, NUTS(), True, None,
                         fused_opts={"fwd_precision": "high3"})

    key = jax.random.PRNGKey(1)
    key, k_init, k_warm = jax.random.split(key, 3)
    state = W.init_warmup_state(k_init, kern_packed.potential, model.dim,
                                n_chains, dtype)
    state, _ = kern_packed.warmup(k_warm, state, stages)
    eps = float(jnp.exp(state.log_eps)) if state.log_eps.ndim == 0 else None

    out = {"shape": {"chains": n_chains, "obs": n_obs, "features": n_feat,
                     "draws": n_draws},
           "shared_eps": eps, "arms": {}}
    for name, kern in (("packed", kern_packed), ("high3", kern_high3)):
        fn = kern._sampling_fn(n_draws)
        r = fn(jax.random.PRNGKey(7), state)       # compile + equilibrate
        float(jnp.sum(r.draws))
        best = None
        for rep in range(3):
            t0 = time.perf_counter()
            r2 = fn(jax.random.PRNGKey(11 + rep), state._replace(z=r.z))
            float(jnp.sum(r2.draws))
            dt = time.perf_counter() - t0
            ess = diag.ess_bulk(r2.draws, cap=False)
            row = {"sample_s": dt,
                   "ess_min": float(jnp.min(ess)),
                   "ess_min_per_s": float(jnp.min(ess)) / dt,
                   "mean_accept": float(jnp.mean(r2.stats.acceptance_rate)),
                   "mean_depth": float(jnp.mean(r2.stats.depth))}
            if best is None or row["ess_min_per_s"] > best["ess_min_per_s"]:
                best = row
        out["arms"][name] = best
        print(name, json.dumps(best))

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "logistic_bwd_ab.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
