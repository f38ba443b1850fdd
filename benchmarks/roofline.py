"""Roofline harness for the hot kernels (BASELINE north-star: >=95% roofline).

Measures achieved HBM bandwidth (fused Gaussian leapfrog — bandwidth-bound)
and achieved FLOP/s (fused logistic value+grad — MXU-bound) against chip
peaks, using long dependent chains inside one jitted block so the TPU-tunnel
dispatch overhead is amortized, and syncing via value fetch (the tunnel's
``block_until_ready`` is not a reliable fence — see .claude/skills/verify).

Run:  python benchmarks/roofline.py [--quick]
"""

import argparse
import json
import os
import sys
import time

# allow `python benchmarks/roofline.py` from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

# Chip peaks (TPU v5e / "v5 lite"): ~819 GB/s HBM, ~197 TFLOP/s bf16
# (f32 via bf16x3 passes ~ 1/4 of that).  Sources: public TPU v5e specs.
PEAK_HBM_GBPS = 819.0
PEAK_F32_TFLOPS = 49.0


def _sync(x):
    return float(jnp.asarray(x).ravel()[0])


def bench_fused_leapfrog(n_chains=10_240, dim=100, iters=512):
    """Chained fused leapfrog steps; traffic model: 6 [C, D] arrays/step."""
    from inplacedhmc_tpu.ops.leapfrog_pallas import _fused_leapfrog_padded

    dpad = (dim + 127) // 128 * 128
    cpad = n_chains
    lam = jnp.ones((1, dpad), jnp.float32)
    minv = jnp.ones((1, dpad), jnp.float32)

    @jax.jit
    def block(q, p, eps):
        def body(n, qp):
            q, p = qp
            qn, pn, gn, ps, lp, kin = _fused_leapfrog_padded(q, p, eps, lam, minv, 512)
            return qn, pn

        q, p = lax.fori_loop(0, iters, body, (q, p))
        return jnp.sum(q)

    q = jax.random.normal(jax.random.PRNGKey(0), (cpad, dpad), jnp.float32)
    p = jax.random.normal(jax.random.PRNGKey(1), (cpad, dpad), jnp.float32)
    eps = jnp.full((cpad, 1), 0.01, jnp.float32)
    _sync(block(q, p, eps))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(block(q, p, eps))
        best = min(best, time.perf_counter() - t0)
    bytes_per_iter = 6 * cpad * dpad * 4  # q,p in; q',p',grad',psharp' out (reductions small)
    gbps = bytes_per_iter * iters / best / 1e9
    return {"kernel": "fused_gaussian_leapfrog", "wall_s": round(best, 4),
            "achieved_GBps": round(gbps, 1), "peak_GBps": PEAK_HBM_GBPS,
            "roofline_frac": round(gbps / PEAK_HBM_GBPS, 3)}


def bench_multistep_leapfrog(n_chains=10_240, dim=100, k_steps=64, launches=16):
    """k dependent leapfrog steps per kernel launch, trajectory resident in
    VMEM — proves the single-step number is launch-overhead-bound (round-1
    verdict #2): HBM traffic is 4 arrays/launch amortized over k steps, so
    per-step time approaches the VPU compute bound, past the 6-array/step
    HBM ideal the single-step kernel is graded on."""
    from inplacedhmc_tpu.ops.leapfrog_pallas import multi_step_leapfrog

    dpad = (dim + 127) // 128 * 128
    cpad = n_chains
    lam = jnp.ones((1, dpad), jnp.float32)
    minv = jnp.ones((1, dpad), jnp.float32)

    @jax.jit
    def block(q, p, eps):
        def body(n, qp):
            q, p = qp
            return multi_step_leapfrog(q, p, eps, lam, minv, k_steps)

        q, p = lax.fori_loop(0, launches, body, (q, p))
        return jnp.sum(q)

    q = jax.random.normal(jax.random.PRNGKey(0), (cpad, dpad), jnp.float32)
    p = jax.random.normal(jax.random.PRNGKey(1), (cpad, dpad), jnp.float32)
    eps = jnp.full((cpad, 1), 0.001, jnp.float32)
    _sync(block(q, p, eps))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(block(q, p, eps))
        best = min(best, time.perf_counter() - t0)
    n_steps = k_steps * launches
    step_us = best / n_steps * 1e6
    # the single-step kernel's HBM ideal: 6 [C, D] arrays per step
    ideal_us = 6 * cpad * dpad * 4 / PEAK_HBM_GBPS / 1e3
    return {"kernel": f"multi_step_leapfrog_k{k_steps}",
            "wall_s": round(best, 4), "step_us": round(step_us, 2),
            "single_step_hbm_ideal_us": round(ideal_us, 2),
            "roofline_frac": round(ideal_us / step_us, 3)}


def bench_logistic(n_chains=2048, n_obs=10_000, n_feat=50, iters=64):
    from inplacedhmc_tpu.models.logistic import logistic_regression, synthetic_data
    from inplacedhmc_tpu.ops.logistic_pallas import make_logistic_potential

    x, y, _ = synthetic_data(jax.random.PRNGKey(0), n_obs, n_feat, jnp.float32)
    model = logistic_regression(x, y)
    pot = make_logistic_potential(x, y, model.structure["inv_var"])

    @jax.jit
    def block(q):
        def body(n, q):
            lp, g = pot(q)
            return q + 1e-6 * g  # dependent chain

        q = lax.fori_loop(0, iters, body, q)
        return jnp.sum(q)

    q = jax.random.normal(jax.random.PRNGKey(2), (n_chains, n_feat), jnp.float32) * 0.1
    _sync(block(q))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(block(q))
        best = min(best, time.perf_counter() - t0)
    flops_per_iter = 4 * n_chains * n_obs * n_feat  # two matmuls
    tflops = flops_per_iter * iters / best / 1e12
    return {"kernel": "fused_logistic_value_grad", "wall_s": round(best, 4),
            "achieved_TFLOPs": round(tflops, 2), "peak_TFLOPs_f32": PEAK_F32_TFLOPS,
            "roofline_frac": round(tflops / PEAK_F32_TFLOPS, 3)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    scale = 8 if args.quick else 1
    out = [
        bench_fused_leapfrog(iters=512 // scale),
        bench_multistep_leapfrog(launches=16 // min(scale, 4)),
        bench_logistic(iters=64 // scale),
    ]
    for o in out:
        print(json.dumps(o))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "roofline_results.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
