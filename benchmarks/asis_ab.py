"""Decisive ASIS A/B at the config-5 operating point (small chain subset).

The 10,240-chain continuation showed joint-proposal ASIS *helping* phi
(tau ~1270 -> ~26 transitions) while *hurting* log_s (tau ~238 -> ~1090),
contradicting the fresh-warmup 256-chain pilot.  This harness isolates the
mechanism: continue a SUBSET of the big run's exact warm state (same dense
metric, same eps, same positions) under three arms — no ASIS, joint ASIS,
per-coordinate ASIS — and report tau/ESS for (phi, log_s) from thin=1 draws.

Run: python benchmarks/asis_ab.py --from-dir .sv_cont2_10k \
       --warmup-dir .sv_ckpt_10k --chains 512 --draws 2000
Writes benchmarks/asis_ab.json.
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
    ap.add_argument("--from-dir", default=".sv_cont2_10k")
    ap.add_argument("--warmup-dir", default=".sv_ckpt_10k")
    ap.add_argument("--t", type=int, default=1000)
    ap.add_argument("--chains", type=int, default=512)
    ap.add_argument("--draws", type=int, default=2000)
    ap.add_argument("--draw-block", type=int, default=100)
    ap.add_argument("--seed", type=int, default=31)
    ap.add_argument("--arms", default="none,joint,per_coord")
    args = ap.parse_args()

    from inplacedhmc_tpu import diagnostics as diag
    from inplacedhmc_tpu.config import NUTS
    from inplacedhmc_tpu.core.state import EvalPoint, WarmupState
    from inplacedhmc_tpu.models.stoch_vol import (make_asis_hook, stoch_vol,
                                                  synthetic_returns)
    from inplacedhmc_tpu.report import LogProgressReport
    from inplacedhmc_tpu.sample import _kernel
    from inplacedhmc_tpu.utils.checkpoint import (load_lean_checkpoint,
                                                  load_warmup_checkpoint)

    returns = synthetic_returns(jax.random.PRNGKey(0), args.t, phi=0.98,
                                s=0.15, dtype=jnp.float32)
    model = stoch_vol(returns)

    wstate, _, _ = load_warmup_checkpoint(
        os.path.join(args.warmup_dir, "warmup.npz"))
    resumed = load_lean_checkpoint(os.path.join(args.from_dir, "sample.npz"))
    assert resumed is not None
    z_full = resumed[0]
    c = args.chains
    z = EvalPoint(q=jnp.asarray(z_full.q[:c]),
                  logp=jnp.asarray(z_full.logp[:c]),
                  grad=jnp.asarray(z_full.grad[:c]))
    state = WarmupState(z=z, metric=wstate.metric, log_eps=wstate.log_eps)

    rows = []
    for arm in args.arms.split(","):
        if arm == "none":
            post = None
        elif arm == "joint":
            post = make_asis_hook(returns)
        else:
            post = make_asis_hook(returns, per_coord=True)
        kern = _kernel(model, NUTS(), True, None, post_step=post)
        t0 = time.perf_counter()
        res = kern.run(jax.random.PRNGKey(args.seed), args.draws, c,
                       warmup_stages=[], state=state,
                       keep_dims=(0, 1), draw_block=args.draw_block,
                       sync_blocks=True,
                       reporter=LogProgressReport(time_interval_s=60.0))
        wall = time.perf_counter() - t0
        d = jnp.asarray(np.asarray(res.draws))           # [N, C, 2]
        ess = np.asarray(diag.ess_bulk(d, cap=False))
        row = {"arm": arm, "chains": c, "draws": args.draws,
               "wall_s": round(wall, 1),
               "ess_phi": round(float(ess[0]), 1),
               "ess_logs": round(float(ess[1]), 1),
               "tau_phi": round(args.draws * c / max(float(ess[0]), 1), 1),
               "tau_logs": round(args.draws * c / max(float(ess[1]), 1), 1),
               "rhat_phi": round(float(diag.split_rhat(d)[0]), 4),
               "rhat_logs": round(float(diag.split_rhat(d)[1]), 4),
               "accept": round(float(np.mean(
                   np.asarray(res.stats.acceptance_rate))), 3)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "asis_ab.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
