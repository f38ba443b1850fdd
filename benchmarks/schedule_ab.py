"""A/B: work-sorted chain scheduling vs unscheduled on the funnel (VERDICT
r2 next #1).

The funnel's tree depth is position-persistent (deep in the neck, shallow in
the mouth): measured tiled lockstep utilization 0.23 at any tile size when
chains are randomly ordered (benchmarks/utilization_curve.json companion
run).  ``schedule='work_sorted'`` packs similar-depth chains into the same
whole-tree-kernel tiles so shallow tiles exit early; this harness measures
the realized wall-clock (and counted-steps/s) of the post-warmup sampling
loop with identical warmup state for both arms.

Run: python benchmarks/schedule_ab.py [--chains 10240] [--draws 64]
Writes benchmarks/schedule_ab.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=10_240)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--draws", type=int, default=64)
    ap.add_argument("--delta", type=float, default=0.85)
    ap.add_argument("--block-c", type=int, default=256,
                    help="kernel tile: smaller tiles give sorting more "
                         "exit granularity")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (sitecustomize pre-selects "
                         "the TPU tunnel; the env var is too late)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from inplacedhmc_tpu import diagnostics as diag
    from inplacedhmc_tpu.config import NUTS, DualAveraging, \
        default_warmup_stages
    from inplacedhmc_tpu.models import funnel
    from inplacedhmc_tpu.sample import _kernel
    import inplacedhmc_tpu.adapt.warmup as W

    model = funnel(args.dim)
    stages = default_warmup_stages(
        local_optimization=None,
        stepsize_adaptation=DualAveraging(delta=args.delta))

    # ONE shared warmup (unscheduled): both arms continue from the same
    # state — identical eps, metric, and positions, so the A/B is pure
    # scheduling (VERDICT r3 weak #4: per-arm warmups gave eps 0.0214 vs
    # 0.028 and confounded the 2.69x wall figure)
    kern0 = _kernel(model, NUTS(), True, None,
                    tree_opts={"block_c": args.block_c})
    key = jax.random.PRNGKey(args.seed)
    key, k_init, k_warm, k_s = jax.random.split(key, 4)
    state0 = W.init_warmup_state(k_init, kern0.potential, model.dim,
                                 args.chains, jnp.float32)
    state0, _ = kern0.warmup(k_warm, state0, stages)

    rows = []
    for schedule in [None, "work_sorted"]:
        kern = _kernel(model, NUTS(), True, None, schedule=schedule,
                       tree_opts={"block_c": args.block_c})
        state = state0
        fn = kern._sampling_fn(args.draws)
        out = fn(k_s, state)
        float(jnp.sum(out.draws))  # compile + fence
        best = float("inf")
        total = 0
        for r in range(args.reps):
            t0 = time.perf_counter()
            out = fn(jax.random.fold_in(k_s, r), state._replace(z=out.z))
            total = int(jnp.sum(out.stats.steps.astype(jnp.int64)))
            float(jnp.sum(out.draws))
            best = min(best, time.perf_counter() - t0)
        util = diag.tiled_lockstep_utilization(out.stats, args.block_c)
        rows.append({
            "schedule": schedule or "none",
            "block_c": args.block_c,
            "wall_s": round(best, 4),
            "counted_steps": total,
            "counted_steps_per_s": round(total / best, 0),
            "recorded_order_tiled_utilization": round(util, 4),
            "depth_mean": round(float(np.mean(np.asarray(out.stats.depth))), 3),
            "eps": round(float(jnp.exp(jnp.atleast_1d(state.log_eps))[0]), 5),
        })
        print(json.dumps(rows[-1]), flush=True)

    speedup = rows[0]["wall_s"] / rows[1]["wall_s"]
    summary = {"speedup_sorted_vs_none": round(speedup, 3)}
    rows.append(summary)
    print(json.dumps(summary))
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "schedule_ab.json")
    with open(out_path, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
