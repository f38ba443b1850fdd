"""Tree-kernel tile sweep on real TPU: block_c x ckpt dtype.

Measures leapfrog steps/s of the whole-transition kernel on the bench config
(100-D std normal, 10240 chains, eps=0.25, max_depth=10) per (block_c,
ckpt_bf16) variant.  Run: python benchmarks/tile_sweep.py [--quick]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import inplacedhmc_tpu as ih
from inplacedhmc_tpu.models import std_normal
from inplacedhmc_tpu.ops.tree_pallas import make_gaussian_tree_transition


def run_variant(block_c, ckpt_bf16, n_chains=10_240, dim=100, n_transitions=8):
    model = std_normal(dim)
    pot = ih.batched_logdensity_and_grad(model.logp)
    metric = ih.identity_metric(dim, jnp.float32)
    eps = jnp.asarray(0.25, jnp.float32)
    trans = make_gaussian_tree_transition(
        model.structure["precision"], metric.inv, max_depth=10,
        block_c=block_c, ckpt_bf16=ckpt_bf16)

    @jax.jit
    def block(key, q):
        z = ih.evaluate(pot, q)

        def step(carry, k):
            z, total = carry
            z2, stats = trans(k, z, eps)
            return (z2, total + jnp.sum(stats.steps.astype(jnp.int64))), None

        keys = jax.random.split(key, n_transitions)
        (z, total), _ = jax.lax.scan(step, (z, jnp.asarray(0, jnp.int64)), keys)
        return z.q, total

    q0 = jax.random.normal(jax.random.PRNGKey(0), (n_chains, dim), jnp.float32)
    t0 = time.perf_counter()
    q1, total = block(jax.random.PRNGKey(1), q0)
    int(total)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    q2, total = block(jax.random.PRNGKey(2), q1)
    total = int(total)
    float(jnp.sum(q2))  # value fetch: reliable fence on the tunnel
    dt = time.perf_counter() - t0
    return {"block_c": block_c, "ckpt_bf16": ckpt_bf16,
            "steps_per_s": round(total / dt, 1), "steps": total,
            "wall_s": round(dt, 3), "compile_s": round(compile_s, 1)}


def main():
    quick = "--quick" in sys.argv
    variants = [(256, False), (256, True), (512, True), (512, False)]
    if quick:
        variants = variants[:2]
    out = []
    for bc, bf in variants:
        try:
            r = run_variant(bc, bf)
        except Exception as e:
            r = {"block_c": bc, "ckpt_bf16": bf, "error": repr(e)[:300]}
        out.append(r)
        print(json.dumps(r), flush=True)
    with open("/root/repo/benchmarks/tile_sweep_results.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
