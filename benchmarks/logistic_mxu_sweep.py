"""Logistic fused-potential MXU attribution + block sweep (VERDICT r2 next #5).

At the benchmark shape (8192 chains x 10k obs x 50 features) the round-2
roofline put the fused kernel at 6.95/49 TFLOPs = 14% of f32 peak.  Two
ceilings sit above it:

* **lane padding**: D=50 pads to 128 lanes, so useful MXU work is 39% of
  issued — a hard 19.1-TFLOPs useful ceiling at f32.
* **the transcendental block**: every evaluation runs exp+log1p over the
  [C, N] response (164M transcendentals at this shape) on the VPU, which a
  back-of-envelope puts at ~2x the padded matmul time — if so, the kernel is
  VPU-bound and the MXU number is the wrong roofline.

This harness measures: the full kernel across (block_c, block_n, grad_bf16),
the same kernel with the transcendental block replaced by linear stand-ins
(``_ablate_trans`` — wrong density, time attribution only), and the XLA
unfused vjp baseline.  useful_tflops counts 4*C*N*D real flops (fwd+bwd
matmul pair).

Run: python benchmarks/logistic_mxu_sweep.py [--quick]
Writes benchmarks/logistic_mxu_sweep.json.
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

C, N, D = 8192, 10_000, 50


#: evaluations chained per device call.  One eval/call is useless on the
#: tunnel: the measured per-call dispatch+fence overhead (~25-55 ms,
#: docs/DESIGN.md §10) exceeds the ~3 ms kernel and floors every arm to the
#: same number.  Chaining through a scan (q <- q + 1e-6 grad keeps the
#: physics live and bounded) amortizes the call tax to <2%.
CHAIN_K = 50


def _time(fn, q, reps=5):
    @jax.jit
    def chained(q0):
        def body(qq, _):
            lp, g = fn(qq)
            return qq + jnp.float32(1e-6) * g, lp
        qf, lps = jax.lax.scan(body, q0, None, length=CHAIN_K)
        return lps[-1], qf

    out = chained(q)
    jax.block_until_ready(out)
    float(jnp.sum(out[0]))  # tunnel fence
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = chained(q)
        float(jnp.sum(out[0]) + jnp.sum(out[1]))
        best = min(best, time.perf_counter() - t0)
    return best / CHAIN_K


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from inplacedhmc_tpu.models import synthetic_data
    from inplacedhmc_tpu.ops.logistic_pallas import make_logistic_potential

    c, n = (1024, 2000) if args.quick else (C, N)
    x, y, _ = synthetic_data(jax.random.PRNGKey(0), n, D, jnp.float32)
    q = jax.random.normal(jax.random.PRNGKey(1), (c, D), jnp.float32) * 0.1
    useful_flops = 4.0 * c * n * D          # fwd + bwd matmul pair, real D
    padded_flops = 4.0 * c * n * 128        # what the MXU actually issues
    inv_var = 0.01

    rows = []
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "logistic_mxu_sweep.json")

    def record(label, wall, **kw):
        row = {"label": label, "wall_ms": round(wall * 1e3, 3),
               "useful_tflops": round(useful_flops / wall / 1e12, 3),
               "padded_tflops": round(padded_flops / wall / 1e12, 3), **kw}
        rows.append(row)
        print(json.dumps(row), flush=True)
        with open(out_path, "w") as f:
            json.dump(rows, f, indent=1)
        return row

    # XLA unfused baseline: plain jnp density through jax.vjp
    xj, yj = jnp.asarray(x), jnp.asarray(y)

    def plain_vg(q):
        def f(qq):
            eta = qq @ xj.T
            return jnp.sum(yj[None] * eta - jnp.logaddexp(0.0, eta), axis=1) \
                - 0.5 * inv_var * jnp.sum(qq * qq, axis=1)
        logp, vjp = jax.vjp(f, q)
        return logp, vjp(jnp.ones_like(logp))[0]

    record("xla_vjp_baseline", _time(jax.jit(plain_vg), q, args.reps))

    # pure-matmul ceiling at these shapes (XLA, no transcendentals): one
    # [C,D]x[D,N] forward and one [C,N]x[N,D] backward.  The residual is
    # derived from eta on the fly (closing over a [C, N] constant bakes
    # ~330 MB into the program and overflows the remote-compile tunnel).
    @jax.jit
    def matmul_pair(q):
        eta = q @ xj.T
        g = (eta * 1e-6 + 0.1) @ xj
        return jnp.sum(eta, axis=1), g

    record("xla_matmul_pair_ceiling", _time(matmul_pair, q, args.reps))

    # fused kernel sweep
    grid_c = [128, 256, 512] if not args.quick else [256]
    grid_n = [512, 1024, 2048] if not args.quick else [512]
    best = None
    for bc, bn, bf16 in itertools.product(grid_c, grid_n, [False, True]):
        try:
            pot = make_logistic_potential(x, y, inv_var, block_c=bc,
                                          block_n=bn, grad_bf16=bf16)
            wall = _time(pot, q, args.reps)
        except Exception as e:
            # e.g. bc=512 x bn=2048 exceeds the 16M scoped-VMEM stack limit
            rows.append({"label": "fused", "block_c": bc, "block_n": bn,
                         "grad_bf16": bf16, "error": repr(e)[:200]})
            with open(out_path, "w") as f:
                json.dump(rows, f, indent=1)
            continue
        row = record("fused", wall, block_c=bc, block_n=bn, grad_bf16=bf16)
        if best is None or wall < best[0]:
            best = (wall, bc, bn, bf16)

    # transcendental ablation at the best config: the gap to the full kernel
    # is the VPU exp/log1p block's share
    _, bc, bn, bf16 = best
    pot_ab = make_logistic_potential(x, y, inv_var, block_c=bc, block_n=bn,
                                     grad_bf16=bf16, _ablate_trans=True)
    record("fused_trans_ablated", _time(pot_ab, q, args.reps),
           block_c=bc, block_n=bn, grad_bf16=bf16)

    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
