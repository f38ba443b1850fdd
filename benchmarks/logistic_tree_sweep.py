"""Sweep whole-tree-kernel knobs for logistic regression (BASELINE config 3).

Grid: block_c (chain tile: MXU M-dim utilization vs lockstep straggling) x
block_n (obs slice: VMEM scratch vs loop overhead) x grad_bf16 (backward
contraction precision).  All variants sample from the SAME warmed-up state,
so steps/s are directly comparable; the best configuration should be
promoted to the driver defaults (sample.py tree_factory).

Run:  python benchmarks/logistic_tree_sweep.py [--chains 8192] [--draws 128]
Writes benchmarks/logistic_tree_sweep.json (one record per variant).
"""
import argparse
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import inplacedhmc_tpu.adapt.warmup as W
from inplacedhmc_tpu.config import NUTS, DualAveraging, default_warmup_stages
from inplacedhmc_tpu.models import logistic_regression, synthetic_data
from inplacedhmc_tpu.sample import _kernel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=8192)
    ap.add_argument("--draws", type=int, default=128)
    ap.add_argument("--obs", type=int, default=10_000)
    ap.add_argument("--feat", type=int, default=50)
    ap.add_argument("--block-c", type=int, nargs="*", default=[128, 256, 512])
    ap.add_argument("--block-n", type=int, nargs="*", default=[2048])
    ap.add_argument("--bf16", type=int, nargs="*", default=[0, 1])
    args = ap.parse_args()

    x, y, _ = synthetic_data(jax.random.PRNGKey(0), args.obs, args.feat)
    model = logistic_regression(x, y)
    stages = default_warmup_stages(
        stepsize_adaptation=DualAveraging(),
        init_steps=50, middle_steps=50, doubling_stages=2,
        terminating_steps=50, metric="dense")
    kern_xla = _kernel(model, NUTS(), True, None, use_pallas="on")
    key = jax.random.PRNGKey(1)
    key, k_init, k_warm, k_sample = jax.random.split(key, 4)
    state = W.init_warmup_state(k_init, kern_xla.potential, model.dim,
                                args.chains, jnp.float32)
    t0 = time.perf_counter()
    state, _ = kern_xla.warmup(k_warm, state, stages)
    float(jnp.sum(state.z.q))
    print(json.dumps({"phase": "warmup",
                      "wall_s": round(time.perf_counter() - t0, 1)}),
          flush=True)

    results = []
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "logistic_tree_sweep.json")

    def flush_results():
        with open(path, "w") as f:
            json.dump({"chains": args.chains, "draws": args.draws,
                       "results": results}, f, indent=1)

    for bc, bn, bf in itertools.product(args.block_c, args.block_n, args.bf16):
        topts = {"block_c": bc, "block_n": bn, "grad_bf16": bool(bf)}
        name = f"bc{bc}_bn{bn}" + ("_bf16" if bf else "")
        try:
            kern = _kernel(model, NUTS(), True, None, use_pallas="tree",
                           tree_opts=topts)
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
            r = {"variant": name, **topts, "wall_s": round(wall, 3),
                 "compile_plus_first_s": round(compile_plus, 1),
                 "steps_per_s": round(steps / wall, 1),
                 "mean_accept": round(
                     float(jnp.mean(out.stats.acceptance_rate)), 3),
                 "mean_depth": round(float(jnp.mean(out.stats.depth)), 2)}
        except Exception as e:  # compile failures are data, not fatal
            r = {"variant": name, **topts, "error": repr(e)[:300]}
        results.append(r)
        print(json.dumps(r), flush=True)
        flush_results()   # incremental: a wedged later variant keeps the rows


if __name__ == "__main__":
    main()
