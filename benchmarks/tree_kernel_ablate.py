"""Attribute whole-tree-kernel time to its bookkeeping subsystems.

Context: the multi-step leapfrog kernel integrates at ~31.75 us/step for 10k
chains (benchmarks/roofline_results.json) = ~322M chain-steps/s, while the
full NUTS tree kernel delivers ~22M steps/s — a ~15x gap that is NUTS
bookkeeping, not integration.  This harness compiles kernel variants with
subsystems statically removed (``_ablate`` hooks in ops/tree_pallas.py —
intentionally incorrect transitions, timing only) and measures each at a
FIXED tree shape so per-leaf work is comparable: eps is tiny (no U-turn, no
divergence inside the window), so every variant executes the full
``2^max_depth - 1`` leaves per transition.

Run:  python benchmarks/tree_kernel_ablate.py [--quick]
Writes benchmarks/ablate_results.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

VARIANTS = [
    ("baseline", frozenset()),
    ("no_turns", frozenset({"turns"})),
    ("no_ckpt", frozenset({"ckpt"})),
    ("no_turns_ckpt", frozenset({"turns", "ckpt"})),
    ("no_proposal", frozenset({"proposal"})),
    ("no_stats", frozenset({"stats"})),
    ("floor", frozenset({"turns", "ckpt", "proposal", "stats"})),
]


def bench_variant(ablate, n_chains, dim, max_depth, n_transitions, block_c):
    import inplacedhmc_tpu as ih
    from inplacedhmc_tpu.models import std_normal
    from inplacedhmc_tpu.ops.tree_pallas import make_gaussian_tree_transition

    model = std_normal(dim)
    pot = ih.batched_logdensity_and_grad(model.logp)
    trans = make_gaussian_tree_transition(
        model.structure["precision"], jnp.ones(dim), max_depth=max_depth,
        block_c=block_c, _ablate=ablate)
    eps = jnp.asarray(0.005, jnp.float32)  # tiny: full 2^md-1 leaves, no turn

    @jax.jit
    def block(key, q):
        z = ih.evaluate(pot, q)

        def step(z, k):
            z2, _ = trans(k, z, eps)
            return z2, None

        z, _ = jax.lax.scan(step, z, jax.random.split(key, n_transitions))
        return z.q

    q0 = jax.random.normal(jax.random.PRNGKey(0), (n_chains, dim), jnp.float32)
    t0 = time.perf_counter()
    q1 = block(jax.random.PRNGKey(1), q0)
    float(jnp.sum(q1))  # value fetch: the only reliable fence on the tunnel
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for r in range(3):
        t0 = time.perf_counter()
        q2 = block(jax.random.PRNGKey(2 + r), q1)
        float(jnp.sum(q2))
        best = min(best, time.perf_counter() - t0)
    leaves = ((1 << max_depth) - 1) * n_transitions * n_chains
    return {
        "variant": "+".join(sorted(ablate)) or "baseline",
        "wall_s": round(best, 4),
        "compile_s": round(compile_s, 1),
        "leaf_steps_per_s": round(leaves / best, 1),
        "us_per_leaf_per_tile": round(
            best / (((1 << max_depth) - 1) * n_transitions)
            / (n_chains / block_c) * 1e6, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--chains", type=int, default=10_240)
    ap.add_argument("--dim", type=int, default=100)
    ap.add_argument("--max-depth", type=int, default=7)
    ap.add_argument("--transitions", type=int, default=8)
    ap.add_argument("--block-c", type=int, default=512)
    args = ap.parse_args()
    if args.quick:
        args.chains, args.transitions = 1024, 2

    results = []
    base = None
    for name, ab in VARIANTS:
        r = bench_variant(ab, args.chains, args.dim, args.max_depth,
                          args.transitions, args.block_c)
        if base is None:
            base = r["wall_s"]
        r["speedup_vs_baseline"] = round(base / r["wall_s"], 3)
        results.append(r)
        print(json.dumps(r), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ablate_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
