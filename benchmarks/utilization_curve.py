"""Lockstep-utilization-vs-tile-size curve (docs/ROADMAP.md item 2).

The whole-tree kernel's per-tile early exits mean a tile only pays for the
deepest trajectory *within the tile*; smaller ``block_c`` straggles less but
tiles the MXU/VPU thinner.  Trajectory depths are algorithm-determined
(identical whichever execution path runs them), so the utilization side of
that trade is measurable from ONE recorded run of the XLA tree on any
backend — no per-tile-size kernel recompiles needed.  The throughput side is
``benchmarks/tile_sweep.py`` (real kernel timings).

Run:  python benchmarks/utilization_curve.py [--chains 8192] [--draws 128]
      [--model std_normal|funnel] [--cpu]
Writes benchmarks/utilization_curve.json and prints one JSON line per tile.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=8192)
    ap.add_argument("--draws", type=int, default=128)
    ap.add_argument("--dim", type=int, default=100)
    ap.add_argument("--model", default="std_normal")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from inplacedhmc_tpu import diagnostics as diag
    from inplacedhmc_tpu import mcmc_with_warmup
    from inplacedhmc_tpu.models import funnel, std_normal

    model = std_normal(args.dim) if args.model == "std_normal" \
        else funnel(args.dim)
    # keep_dims=[0]: only the tree stats matter here, not the draws
    out = mcmc_with_warmup(jax.random.PRNGKey(args.seed), model, args.draws,
                           n_chains=args.chains, use_pallas="off",
                           keep_dims=[0])
    rows = []
    for bc in [32, 64, 128, 256, 512, 1024, args.chains]:
        u = diag.tiled_lockstep_utilization(out.stats, block_c=bc)
        row = {"block_c": bc, "utilization": round(u, 4)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "utilization_curve.json")
    with open(path, "w") as f:
        json.dump({"model": args.model, "chains": args.chains,
                   "draws": args.draws,
                   "mean_depth": round(float(jnp.mean(out.stats.depth)), 2),
                   "curve": rows}, f, indent=1)


if __name__ == "__main__":
    main()
