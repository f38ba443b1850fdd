"""MXU precision A/B for the fused logistic potential (round 4).

Finding that motivated this harness: jax's DEFAULT matmul precision on TPU
is a SINGLE bf16 pass.  The fused kernel's forward contraction (eta = q X^T)
ran at DEFAULT through round 4's first half, which puts ~1e-2 relative error
in every eta element; the log-likelihood sums ~1e4 such terms, leaving O(1)
ABSOLUTE error in logp at the benchmark shape.  logp error is not like
gradient error: the sampler targets exp(logp_computed), so a deterministic
O(1) perturbation of logp is a bias in the stationary distribution itself
(an e^{+-err} multiplicative warp of the density).  The CPU interpret-mode
tests cannot see this — interpret-mode dots are exact f32.

This harness measures, at the benchmark shape (8192 chains x 10k obs x 50
features, bc=512/bn=1024, 50 evals chained per call to amortize the tunnel
call tax):

* wall time per evaluation for forward precision in {default, high, highest}
  x backward {default, highest};
* logp max/rms ABSOLUTE error and grad max RELATIVE error vs a float64
  reference, on a 512-chain slice drawn from the posterior bulk scale.

Decision rule: ship the cheapest forward precision with logp rms error
comparable to f32 accumulation noise (<~1e-2 at N=1e4); backward stays
"default" — a deterministic gradient perturbation only moves acceptance,
never the target (leapfrog reversibility/volume preservation hold for any
deterministic field; energies stay f32).

Run: python benchmarks/logistic_precision_ab.py [--quick]
Writes benchmarks/logistic_precision_ab.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

C, N, D = 8192, 10_000, 50
CHAIN_K = 50  # evals per device call; tunnel call tax ~25-55 ms (DESIGN §10)


def _time_per_eval(pot, q, reps=5, chain_k=CHAIN_K):
    @jax.jit
    def chained(q0):
        def body(qq, _):
            lp, g = pot(qq)
            return qq + jnp.float32(1e-6) * g, lp
        qf, lps = jax.lax.scan(body, q0, None, length=chain_k)
        return lps[-1], qf

    out = chained(q)
    jax.block_until_ready(out)
    float(jnp.sum(out[0]))  # tunnel fence
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = chained(q)
        float(jnp.sum(out[0]))
        best = min(best, (time.perf_counter() - t0) / chain_k)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    n, c = (2048, 2048) if args.quick else (N, C)

    rng = np.random.default_rng(7)
    x64 = rng.normal(size=(n, D))
    y64 = (rng.random(n) < 0.5).astype(np.float64)
    q64 = rng.normal(size=(c, D)) * 0.1  # posterior-bulk scale for beta
    q32 = jnp.asarray(q64, jnp.float32)

    # float64 reference on a chain slice (keeps the host matmul cheap)
    cs = min(c, 512)
    eta = q64[:cs] @ x64.T
    ll64 = (y64[None, :] * eta - np.logaddexp(0.0, eta)).sum(1) \
        - 0.5 * (q64[:cs] ** 2).sum(1)
    g64 = (y64[None, :] - 1.0 / (1.0 + np.exp(-eta))) @ x64 - q64[:cs]

    from inplacedhmc_tpu.ops.logistic_pallas import make_logistic_potential

    rows = []
    # "high3" (== "high") = the in-kernel 3-pass split; "packed" = the
    # separate opt-in 2-pass split riding the dead contraction lanes (D<=64)
    for fwd in ("default", "high3", "packed", "highest"):
        for bwd in ("default", "highest"):
            if bwd == "highest" and fwd != "highest":
                continue  # only need one "everything exact" anchor
            pot = make_logistic_potential(x64, y64, 1.0, block_c=512,
                                          block_n=1024, fwd_precision=fwd,
                                          bwd_precision=bwd)
            lp, g = pot(q32)
            lp = np.asarray(lp)[:cs]
            g = np.asarray(g)[:cs]
            row = {
                "fwd": fwd, "bwd": bwd,
                "logp_abs_err_max": float(np.abs(lp - ll64).max()),
                "logp_abs_err_rms": float(np.sqrt(((lp - ll64) ** 2).mean())),
                "grad_rel_err_max": float(
                    np.abs(g - g64).max() / np.abs(g64).max()),
                "ms_per_eval": _time_per_eval(pot, q32) * 1e3,
            }
            rows.append(row)
            print(json.dumps(row))

    out = {
        "shape": {"chains": c, "obs": n, "features": D,
                  "block_c": 512, "block_n": 1024, "chain_k": CHAIN_K},
        "backend": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "rows": rows,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "logistic_precision_ab.json")
    if not args.quick:
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print("wrote", path)


if __name__ == "__main__":
    main()
