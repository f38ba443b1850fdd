"""Logistic-regression primary-metric A/B: whole-tree Pallas kernel vs the
XLA tree + fused potential, at the BASELINE config 3 shape (10k obs x 50
features, dense metric), measured from the same warmed-up state.

Reports uncapped min-ESS/s (the round-1 verdict's "make the metric real").
Run:  python benchmarks/logistic_ab.py [--chains N] [--draws N]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import inplacedhmc_tpu.adapt.warmup as W
from inplacedhmc_tpu import diagnostics as diag
from inplacedhmc_tpu.config import NUTS, DualAveraging, default_warmup_stages
from inplacedhmc_tpu.models import logistic_regression, synthetic_data
from inplacedhmc_tpu.sample import _kernel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=2048)
    ap.add_argument("--draws", type=int, default=512)
    ap.add_argument("--obs", type=int, default=10_000)
    ap.add_argument("--feat", type=int, default=50)
    args = ap.parse_args()

    x, y, _ = synthetic_data(jax.random.PRNGKey(0), args.obs, args.feat)
    model = logistic_regression(x, y)
    stages = default_warmup_stages(
        stepsize_adaptation=DualAveraging(),
        init_steps=50, middle_steps=50, doubling_stages=2,
        terminating_steps=50, metric="dense")

    # warm up once on the XLA+fused-potential path; both variants sample from
    # the same adapted state
    kern_xla = _kernel(model, NUTS(), True, None, use_pallas="on")
    key = jax.random.PRNGKey(1)
    key, k_init, k_warm, k_sample = jax.random.split(key, 4)
    state = W.init_warmup_state(k_init, kern_xla.potential, model.dim,
                                args.chains, jnp.float32)
    t0 = time.perf_counter()
    state, _ = kern_xla.warmup(k_warm, state, stages)
    float(jnp.sum(state.z.q))
    print(json.dumps({"phase": "warmup", "wall_s": round(time.perf_counter() - t0, 1),
                      "eps": float(jnp.exp(state.log_eps))}), flush=True)

    kern_tree = _kernel(model, NUTS(), True, None, use_pallas="tree")
    kern_tree_vjp = _kernel(model, NUTS(), True, None, use_pallas="tree",
                            tree_opts={"physics_mode": "vjp"})
    kern_tree_bf16 = _kernel(model, NUTS(), True, None, use_pallas="tree",
                             tree_opts={"grad_bf16": True})
    kern_bf16 = _kernel(model, NUTS(), True, None, use_pallas="on",
                        fused_opts={"grad_bf16": True})
    results = {}
    for name, kern in [("xla_fused_potential", kern_xla),
                       ("xla_fused_potential_gradbf16", kern_bf16),
                       ("tree_kernel", kern_tree),           # chunked physics
                       ("tree_kernel_vjp", kern_tree_vjp),   # round-1 physics
                       ("tree_kernel_gradbf16", kern_tree_bf16)]:
        fn = kern._sampling_fn(args.draws)
        t0 = time.perf_counter()
        out = fn(k_sample, state)
        float(jnp.sum(out.draws))
        compile_plus = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = fn(jax.random.PRNGKey(7), state._replace(z=out.z))
        float(jnp.sum(out.draws))
        wall = time.perf_counter() - t0
        steps = int(jnp.sum(out.stats.steps))
        ess = diag.ess_bulk(out.draws, cap=False)
        r = {"variant": name, "wall_s": round(wall, 3),
             "compile_plus_first_s": round(compile_plus, 1),
             "steps_per_s": round(steps / wall, 1),
             "ess_min_per_s": round(float(jnp.min(ess)) / wall, 1),
             "ess_mean_per_s": round(float(jnp.mean(ess)) / wall, 1),
             "mean_accept": round(float(jnp.mean(out.stats.acceptance_rate)), 3),
             "mean_depth": round(float(jnp.mean(out.stats.depth)), 2)}
        results[name] = r
        print(json.dumps(r), flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"logistic_ab_c{args.chains}.json")
    with open(path, "w") as f:
        json.dump({"chains": args.chains, "draws": args.draws, **results}, f,
                  indent=1)


if __name__ == "__main__":
    main()
