"""Config-5 continuation: extend the 10,240-chain stochastic-volatility run.

The warmup + first 1000 post-warmup transitions live in ``--from-dir`` (the
round-2/3 checkpoints: ``warmup.npz`` with the adapted dense metric and eps,
``sample.npz`` with the final phase point).  Those 1000 transitions double as
extended burn-in; this script starts a FRESH moment accumulation from that
state and samples ``--draws x --thin`` more transitions with incremental
checkpointing, then reports split-R-hat over every coordinate from the
streamed moments (BASELINE config 5 at its stated scale; VERDICT r2 next #2).

Run: JAX_COMPILATION_CACHE_DIR=.jax_cache python benchmarks/sv_continue.py \
       --from-dir .sv_ckpt_10k --out-dir .sv_cont_10k --draws 1250 --thin 8
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
    ap.add_argument("--from-dir", default=".sv_ckpt_10k")
    ap.add_argument("--warmup-dir", default=None,
                    help="directory holding warmup.npz (adapted metric/eps); "
                         "defaults to --from-dir — chained continuations "
                         "point this at the original warmup")
    ap.add_argument("--out-dir", default=".sv_cont_10k")
    ap.add_argument("--t", type=int, default=1000)
    ap.add_argument("--chains", type=int, default=10240)
    ap.add_argument("--draws", type=int, default=1250)
    ap.add_argument("--thin", type=int, default=8)
    ap.add_argument("--draw-block", type=int, default=12)
    ap.add_argument("--checkpoint-throttle", type=float, default=120.0)
    ap.add_argument("--seed", type=int, default=17)
    ap.add_argument("--asis", action="store_true",
                    help="interleave ASIS hyperparameter MH updates after "
                         "every transition (measured 40x mixing win for "
                         "phi/log_s: tau_phi ~1270 -> ~32 transitions)")
    ap.add_argument("--asis-per-coord", action="store_true",
                    help="per-coordinate ASIS MH (decouples the tight log_s "
                         "ancillary conditional from phi; benchmarks/"
                         "asis_ab.json: tau_phi 49->6.7, tau_logs 201->19.4)")
    args = ap.parse_args()

    from inplacedhmc_tpu import diagnostics as diag
    from inplacedhmc_tpu.config import NUTS
    from inplacedhmc_tpu.core.state import WarmupState
    from inplacedhmc_tpu.models.stoch_vol import stoch_vol, synthetic_returns
    from inplacedhmc_tpu.report import LogProgressReport
    from inplacedhmc_tpu.sample import _kernel
    from inplacedhmc_tpu.utils.checkpoint import (load_lean_checkpoint,
                                                  load_warmup_checkpoint)

    returns = synthetic_returns(jax.random.PRNGKey(0), args.t, phi=0.98,
                                s=0.15, dtype=jnp.float32)
    model = stoch_vol(returns)

    wstate, _, _ = load_warmup_checkpoint(
        os.path.join(args.warmup_dir or args.from_dir, "warmup.npz"))
    resumed = load_lean_checkpoint(os.path.join(args.from_dir, "sample.npz"))
    assert resumed is not None, f"no sample checkpoint in {args.from_dir}"
    z_final = resumed[0]
    state = WarmupState(z=z_final, metric=wstate.metric,
                        log_eps=wstate.log_eps)
    print(f"resuming from {args.from_dir}: z {z_final.q.shape}, "
          f"eps {float(jnp.exp(jnp.atleast_1d(state.log_eps))[0]):.4g}",
          flush=True)

    os.makedirs(args.out_dir, exist_ok=True)
    post = None
    if args.asis or args.asis_per_coord:
        from inplacedhmc_tpu.models.stoch_vol import make_asis_hook
        post = make_asis_hook(returns, per_coord=args.asis_per_coord)
    kern = _kernel(model, NUTS(), True, None, post_step=post)
    t0 = time.perf_counter()
    res = kern.run(jax.random.PRNGKey(args.seed), args.draws, args.chains,
                   warmup_stages=[], state=state,
                   thin=args.thin, draw_block=args.draw_block,
                   keep_dims=tuple(range(10)), collect_moments=True,
                   sample_checkpoint_path=os.path.join(args.out_dir,
                                                       "sample.npz"),
                   checkpoint_throttle_s=args.checkpoint_throttle,
                   sync_blocks=True,
                   reporter=LogProgressReport(time_interval_s=30.0))
    wall = time.perf_counter() - t0

    rhat = np.asarray(diag.split_rhat_from_moments(res.sample_moments))

    def chunked(fn, x, bs=64):
        return np.concatenate([np.asarray(fn(x[:, :, i:i + bs]))
                               for i in range(0, x.shape[-1], bs)])

    ess_kept = chunked(lambda d: diag.ess_bulk(d, cap=False),
                       jnp.asarray(res.draws))
    out = {
        "t": args.t, "chains": args.chains, "draws": args.draws,
        "thin": args.thin, "metric": "dense", "delta": 0.9,
        "stream": True, "continuation_of": args.from_dir,
        "asis": ("per_coord" if args.asis_per_coord else bool(args.asis)),
        "wall_s": round(wall, 1),
        "rhat_max": round(float(rhat.max()), 4),
        "rhat_phi": round(float(rhat[0]), 4),
        "rhat_logs": round(float(rhat[1]), 4),
        "rhat_h_max": round(float(rhat[2:].max()), 4),
        "ess_scope": "phi,log_s,h1..h8",
        "ess_min": round(float(ess_kept.min()), 1),
        "ess_phi": round(float(ess_kept[0]), 1),
        "ess_logs": round(float(ess_kept[1]), 1),
        "ess_min_per_s": round(float(ess_kept.min()) / wall, 1),
        "accept": round(float(np.mean(np.asarray(res.stats.acceptance_rate))), 3),
        "depth_mean": round(float(np.mean(np.asarray(res.stats.depth))), 2),
        "div_frac": round(float(diag.divergence_fraction(res.stats)), 5),
    }
    print(json.dumps(out))
    with open(os.path.join(args.out_dir, "result.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
