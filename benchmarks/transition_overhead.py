"""Attribute the whole-tree transition's FIXED per-transition cost.

Motivation (round 3): at the flagship operating point (eps=0.25, std normal)
every chain terminates top-level at depth 4 (steps = 15 = 2^4 - 1), so only
~15 leaf iterations execute per transition, yet a transition costs ~6.9 ms —
fitting the depth-7 ablation's per-leaf slope (~9.6 us/leaf/tile) leaves a
~4 ms intercept.  This harness measures wall vs leaf count (eps sweep) and vs
max_depth (unrolled-code size) to locate the intercept: out-of-kernel XLA ops
(momentum sampling, pad copies), per-program Mosaic startup, or skipped-block
overhead.

Run: python benchmarks/transition_overhead.py
Writes benchmarks/transition_overhead.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def bench(eps_val, max_depth, n_chains=10_240, dim=100, n_transitions=16,
          block_c=512, reps=3):
    import inplacedhmc_tpu as ih
    from inplacedhmc_tpu.models import std_normal
    from inplacedhmc_tpu.ops.tree_pallas import make_gaussian_tree_transition

    model = std_normal(dim)
    pot = ih.batched_logdensity_and_grad(model.logp)
    trans = make_gaussian_tree_transition(
        model.structure["precision"], jnp.ones(dim), max_depth=max_depth,
        block_c=block_c)
    eps = jnp.asarray(eps_val, jnp.float32)

    @jax.jit
    def block(key, q):
        z = ih.evaluate(pot, q)

        def step(carry, k):
            z, total = carry
            z2, stats = trans(k, z, eps)
            return (z2, total + jnp.sum(stats.steps.astype(jnp.int32))), None

        (z, total), _ = jax.lax.scan(step, (z, jnp.asarray(0, jnp.int32)),
                                     jax.random.split(key, n_transitions))
        return z.q, total

    q0 = jax.random.normal(jax.random.PRNGKey(0), (n_chains, dim), jnp.float32)
    q1, total = block(jax.random.PRNGKey(1), q0)
    int(total)
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        q2, total = block(jax.random.PRNGKey(2 + r), q1)
        total = int(total)
        float(jnp.sum(q2))
        best = min(best, time.perf_counter() - t0)
    steps_per_chain = total / (n_transitions * n_chains)
    return {
        "eps": float(eps_val), "max_depth": max_depth,
        "wall_per_transition_ms": round(best / n_transitions * 1e3, 3),
        "steps_per_chain_per_transition": round(steps_per_chain, 2),
        "counted_steps_per_s": round(total / best, 0),
    }


def main():
    rows = []
    # leaf-count sweep at fixed max_depth: the slope is the per-leaf cost,
    # the intercept the fixed per-transition cost
    for eps_val, md in [(0.005, 7), (0.08, 7), (0.25, 7), (0.25, 10),
                        (0.005, 10)]:
        r = bench(eps_val, md)
        rows.append(r)
        print(json.dumps(r), flush=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "transition_overhead.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
