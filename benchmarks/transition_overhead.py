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
          block_c=512, reps=3, ablate=frozenset(), label=None):
    import inplacedhmc_tpu as ih
    from inplacedhmc_tpu.models import std_normal
    from inplacedhmc_tpu.ops.tree_pallas import make_gaussian_tree_transition

    model = std_normal(dim)
    pot = ih.batched_logdensity_and_grad(model.logp)
    trans = make_gaussian_tree_transition(
        model.structure["precision"], jnp.ones(dim), max_depth=max_depth,
        block_c=block_c, _ablate=ablate)
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
    row = {
        "eps": float(eps_val), "max_depth": max_depth,
        "block_c": block_c,
        "wall_per_transition_ms": round(best / n_transitions * 1e3, 3),
        "steps_per_chain_per_transition": round(steps_per_chain, 2),
        "counted_steps_per_s": round(total / best, 0),
    }
    if ablate:
        row["ablate"] = sorted(ablate)
    if label:
        row["label"] = label
    return row


def bench_outside_only(n_chains=10_240, dim=100, n_transitions=16,
                       block_c=512, reps=3):
    """Everything the per-transition scan body does EXCEPT the Mosaic kernel:
    key splits, momentum threefry-normal, direction bits, pad copies in,
    unpad out — with the kernel replaced by one elementwise op on the padded
    buffers.  Directly measures the out-of-kernel share of the intercept."""
    from inplacedhmc_tpu.ops.common import chain_tiles, round_up

    dpad = round_up(dim, 128)
    cpad, _ = chain_tiles(n_chains, block_c)

    @jax.jit
    def block(key, q):
        def step(q, k):
            k, k_p, k_dir, k_seed = jax.random.split(k, 4)
            mom = jax.random.normal(k_p, (n_chains, dim), jnp.float32)
            dirs = jax.random.bits(k_dir, (n_chains,), jnp.uint32)
            seed = jax.random.bits(k_seed, (2,), jnp.uint32).astype(jnp.int32)
            q0 = jnp.zeros((cpad, dpad), jnp.float32).at[:n_chains, :dim].set(q)
            p0 = jnp.zeros((cpad, dpad), jnp.float32).at[:n_chains, :dim].set(mom)
            epsc = jnp.zeros((cpad, 1), jnp.float32).at[:n_chains, 0].set(0.25)
            dirsc = jnp.zeros((cpad, 1), jnp.int32).at[:n_chains, 0].set(
                dirs.astype(jnp.int32))
            validc = jnp.zeros((cpad, 1), jnp.int32).at[:n_chains, 0].set(1)
            # stand-in for the kernel: one elementwise combine of the inputs
            qo = q0 + 1e-6 * p0 + epsc + dirsc.astype(jnp.float32) * 0.0 \
                + validc.astype(jnp.float32) * 0.0 + seed[0] * 0.0
            return qo[:n_chains, :dim], None

        q, _ = jax.lax.scan(step, q, jax.random.split(key, n_transitions))
        return q

    q0 = jax.random.normal(jax.random.PRNGKey(0), (n_chains, dim), jnp.float32)
    q1 = block(jax.random.PRNGKey(1), q0)
    float(jnp.sum(q1))
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        q2 = block(jax.random.PRNGKey(2 + r), q1)
        float(jnp.sum(q2))
        best = min(best, time.perf_counter() - t0)
    return {"label": "outside_kernel_only",
            "wall_per_transition_ms": round(best / n_transitions * 1e3, 3)}


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="sweep",
                    choices=["sweep", "attr"],
                    help="sweep: the original eps/md sweep; attr: intercept "
                         "attribution at the flagship point (block_c sweep, "
                         "md code-size sweep, subsystem ablations, "
                         "outside-kernel-only scan)")
    args = ap.parse_args()

    rows = []

    def run(fn, *a, **kw):
        r = fn(*a, **kw)
        rows.append(r)
        print(json.dumps(r), flush=True)

    if args.mode == "sweep":
        # leaf-count sweep at fixed max_depth: the slope is the per-leaf
        # cost, the intercept the fixed per-transition cost
        for eps_val, md in [(0.005, 7), (0.08, 7), (0.25, 7), (0.25, 10),
                            (0.005, 10)]:
            run(bench, eps_val, md)
        out_name = "transition_overhead.json"
    else:
        # out-of-kernel share
        run(bench_outside_only)
        # per-tile fixed cost: fewer/larger tiles at the flagship point
        for bc in [256, 512, 1024, 2048]:
            run(bench, 0.25, 10, block_c=bc)
        # unrolled-code-size / skipped-block cost: natural depth is 4
        # everywhere (steps stay 15), only the static structure varies
        for md in [5, 6, 8, 10]:
            run(bench, 0.25, md, label="md_sweep")
        # subsystem ablations AT the flagship point (round-2 ablation ran
        # depth-7 trees; the intercept needs the 15-step operating point)
        for ab in [frozenset({"turns"}), frozenset({"ckpt"}),
                   frozenset({"proposal"}), frozenset({"stats"}),
                   frozenset({"turns", "ckpt", "proposal", "stats"})]:
            run(bench, 0.25, 10, ablate=ab)
        out_name = "transition_attr.json"

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), out_name)
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
