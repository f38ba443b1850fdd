"""Stoch-vol mixing experiments: which metric/schedule reaches R-hat <= 1.01
(BASELINE config 5 / round-1 verdict item 4).

The slow directions are (arctanh phi, log s): with T latents and one
observation per latent, the hyperparameters move on a much longer timescale
than the h field.  Candidate levers: low-rank+diag metric (captures the
phi/s x h coupling), higher delta, more doubling windows, longer chains.

Usage: python benchmarks/sv_mixing.py [--t 200] [--chains 16] [--draws 800]
       [--metric diag|low_rank|dense] [--rank 16] [--delta 0.9]
       [--doublings 4] [--thin 1] [--stream]
Prints one JSON line.
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

from inplacedhmc_tpu import diagnostics as diag
from inplacedhmc_tpu.config import DualAveraging, default_warmup_stages
from inplacedhmc_tpu.models import stoch_vol, synthetic_returns
from inplacedhmc_tpu.sample import mcmc_with_warmup


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=200)
    ap.add_argument("--chains", type=int, default=16)
    ap.add_argument("--draws", type=int, default=800)
    ap.add_argument("--metric", default="diag")
    ap.add_argument("--rank", type=int, default=16)
    ap.add_argument("--delta", type=float, default=0.9)
    ap.add_argument("--doublings", type=int, default=4)
    ap.add_argument("--middle", type=int, default=25)
    ap.add_argument("--thin", type=int, default=1)
    ap.add_argument("--stream", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dtype", default="f32")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the env var is too late: "
                         "sitecustomize imports jax before this script runs)")
    ap.add_argument("--moments", action="store_true",
                    help="memory-bounded mode: record only (phi, log_s, "
                         "h_1..h_8) and take R-hat over ALL dims from "
                         "streaming split-moments")
    ap.add_argument("--asis", action="store_true",
                    help="interleave ASIS hyperparameter MH updates "
                         "(models.stoch_vol.make_asis_hook)")
    ap.add_argument("--asis-per-coord", action="store_true",
                    help="per-coordinate ASIS MH (decouples the tight "
                         "log_s ancillary conditional from phi; see "
                         "make_asis_hook docstring)")
    ap.add_argument("--asis-scale", type=float, nargs=2, default=(0.06, 0.1),
                    metavar=("PHI", "LOGS"),
                    help="RW proposal sds for (arctanh phi, log s); the "
                         "ancillary log_s conditional sd is ~1/sqrt(2T), so "
                         "per-coord runs at T=1000 want ~0.05")
    ap.add_argument("--use-pallas", default="auto",
                    help="NUTSKernel use_pallas policy for this run")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="directory for warmup/sampling checkpoints: "
                         "crashed runs resume from the last completed "
                         "stage / sampling block")
    ap.add_argument("--draw-block", type=int, default=None)
    ap.add_argument("--checkpoint-throttle", type=float, default=0.0,
                    help="seconds between sampling-checkpoint saves (0 = "
                         "every block); long runs with small blocks should "
                         "throttle — a ~1 GB lean state saved every few "
                         "seconds dominates wall time")
    ap.add_argument("--tuning-chunk", type=int, default=None)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    dtype = jnp.float32 if args.dtype == "f32" else jnp.float64
    returns = synthetic_returns(jax.random.PRNGKey(0), args.t, phi=0.98,
                                s=0.15, dtype=dtype)
    model = stoch_vol(returns)
    stages = default_warmup_stages(
        local_optimization=None,
        stepsize_adaptation=DualAveraging(delta=args.delta),
        init_steps=75, middle_steps=args.middle,
        doubling_stages=args.doublings, terminating_steps=50,
        metric=args.metric, rank=args.rank, stream=args.stream)

    extra = {}
    t0 = time.perf_counter()
    reporter = None
    if args.verbose:
        from inplacedhmc_tpu.report import LogProgressReport
        reporter = LogProgressReport(time_interval_s=0.0)
    wck = sck = None
    if args.checkpoint_dir:
        os.makedirs(args.checkpoint_dir, exist_ok=True)
        wck = os.path.join(args.checkpoint_dir, "warmup.npz")
        sck = os.path.join(args.checkpoint_dir, "sample.npz")
    post = None
    if args.asis or args.asis_per_coord:
        from inplacedhmc_tpu.models.stoch_vol import make_asis_hook
        post = make_asis_hook(returns, scale=tuple(args.asis_scale),
                              per_coord=args.asis_per_coord)
    res = mcmc_with_warmup(jax.random.PRNGKey(args.seed), model, args.draws,
                           args.chains, warmup_stages=stages, dtype=dtype,
                           post_step=post,
                           use_pallas=args.use_pallas,
                           warmup_checkpoint_path=wck,
                           sample_checkpoint_path=sck,
                           checkpoint_throttle_s=args.checkpoint_throttle,
                           thin=args.thin, draw_block=args.draw_block,
                           tuning_chunk=args.tuning_chunk, reporter=reporter,
                           sync_blocks=True,
                           keep_dims=tuple(range(10)) if args.moments else None,
                           collect_moments=args.moments)
    draws = np.asarray(res.draws)
    wall = time.perf_counter() - t0

    # chunk diagnostics over dims: the zero-padded ESS FFT on the full
    # [N, C, D] cube exhausts HBM at T=1000
    def chunked(fn, x, bs=64):
        return np.concatenate([np.asarray(fn(x[:, :, i:i + bs]))
                               for i in range(0, x.shape[-1], bs)])

    if args.moments:
        # R-hat over every coordinate from the streamed moments; ESS over
        # the recorded subset (phi and log_s are the slowest coordinates)
        rhat = np.asarray(diag.split_rhat_from_moments(res.sample_moments))
        ess_kept = chunked(lambda d: diag.ess_bulk(d, cap=False), res.draws)
        ess = np.full(rhat.shape, np.nan)
        ess[:10] = ess_kept
        extra["ess_scope"] = "phi,log_s,h1..h8"
        extra["ess_min"] = round(float(ess_kept.min()), 1)
    else:
        rhat = chunked(diag.split_rhat, res.draws)
        ess = chunked(lambda d: diag.ess_bulk(d, cap=False), res.draws)
    out = {
        "t": args.t, "chains": args.chains, "draws": args.draws,
        "thin": args.thin, "metric": args.metric, "rank": args.rank,
        "delta": args.delta, "doublings": args.doublings,
        "stream": bool(args.stream),
        "asis": ("per_coord" if args.asis_per_coord
                 else bool(args.asis)),
        "wall_s": round(wall, 1),
        "rhat_max": round(float(rhat.max()), 4),
        "rhat_phi": round(float(rhat[0]), 4),
        "rhat_logs": round(float(rhat[1]), 4),
        "rhat_h_max": round(float(rhat[2:].max()), 4),
        "ess_min": round(float(np.nanmin(ess)), 1),
        "ess_phi": round(float(ess[0]), 1),
        "ess_logs": round(float(ess[1]), 1),
        **extra,
        "accept": round(float(np.mean(np.asarray(res.stats.acceptance_rate))), 3),
        "depth_mean": round(float(np.mean(np.asarray(res.stats.depth))), 2),
        "div_frac": round(float(diag.divergence_fraction(res.stats)), 5),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
