"""Instrumented config-5 warmup: diagnose the at-scale adaptation failure.

VERDICT r4 missing #1: a fresh 10,240-chain pooled dense warmup lands on a
kernel (eps 0.0615, its metric) whose theta mixing is 20x slower than the
kernel a smaller warmup produces (eps 0.0895) — rhat stuck at 1.10 after
4000 transitions.  Candidate causes named there: final-window eps averaging
over a not-yet-equilibrated ensemble; dense-metric pollution by stragglers;
DA/pooled-acceptance interaction.  A fourth, structural candidate: at
>= NUTSKernel.TREE_MIN_CHAINS (4096) chains the warmup's transitions run in
the whole-tree Pallas kernel, below it on the XLA tree — the good round-2
kernels may simply predate / bypass the tree-kernel tuning path.

This harness separates those: it runs a FRESH pooled dense streamed warmup
(the config-5 recipe) stage by stage with full instrumentation —

  per window: eps, acceptance (mean/q10), divergence fraction, depth mean,
  ensemble theta spread (raw_phi, log_s mean/sd/quantiles), logp quantiles,
  and the dense metric's theta block (cov[00], cov[11], corr(theta, h) max,
  eigenvalue extremes of M^-1)

— then freezes the warmup product and measures its MIXING QUALITY with a
fixed-kernel probe at IDENTICAL probe conditions regardless of how the
warmup ran: ``--probe-chains`` chains (below the tree-kernel threshold, so
the probe engine is always the XLA tree), per-coordinate ASIS interleaved as
a separate jitted program every transition (dispatch-level composition, no
fused-hook compile risk), tau_phi / tau_logs from thin=1 draws.

Arms to compare (each one invocation):
  python benchmarks/sv_warmup_diag.py --chains 10240 --policy auto --tag 10k_kernel
  python benchmarks/sv_warmup_diag.py --chains 10240 --policy off  --tag 10k_xla
  python benchmarks/sv_warmup_diag.py --chains 1024  --policy auto --tag 1k
Writes benchmarks/sv_warmup_diag_<tag>.json + .sv_diag_<tag>/warmup.npz.
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

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))


def _q(x, ps=(5, 50, 95)):
    x = np.asarray(x, np.float64)
    return {f"p{p:02d}": round(float(np.percentile(x, p)), 4) for p in ps}


def metric_diag(metric):
    """Host-side diagnostics of a dense metric's theta block."""
    from inplacedhmc_tpu.core.metric import DenseMetric, DiagMetric
    if isinstance(metric, DiagMetric):
        inv = np.asarray(metric.inv, np.float64)
        if inv.ndim != 1:
            return {"kind": "diag_per_chain"}
        return {"kind": "diag", "var_phi": round(float(inv[0]), 5),
                "var_logs": round(float(inv[1]), 5)}
    if not isinstance(metric, DenseMetric):
        return {"kind": type(metric).__name__}
    cov = np.asarray(metric.inv, np.float64)
    sd = np.sqrt(np.maximum(np.diag(cov), 1e-30))
    corr = cov / sd[:, None] / sd[None, :]
    ev = np.linalg.eigvalsh(cov)
    return {
        "kind": "dense",
        "var_phi": round(float(cov[0, 0]), 5),
        "var_logs": round(float(cov[1, 1]), 5),
        "corr_phi_logs": round(float(corr[0, 1]), 4),
        "corr_phi_h_max": round(float(np.abs(corr[0, 2:]).max()), 4),
        "corr_logs_h_max": round(float(np.abs(corr[1, 2:]).max()), 4),
        "h_var_med": round(float(np.median(np.diag(cov)[2:])), 5),
        "eig_min": float(ev[0]), "eig_max": float(ev[-1]),
        "cond": float(ev[-1] / max(ev[0], 1e-30)),
    }


def window_record(label, state, stats, wall):
    z = state.z
    q = np.asarray(z.q)
    lp = np.asarray(z.logp, np.float64)
    rec = {"stage": label, "wall_s": round(wall, 1)}
    if state.log_eps is not None:
        rec["eps"] = round(float(np.exp(np.asarray(state.log_eps))), 5)
    if stats:
        from inplacedhmc_tpu.core.state import Termination
        st = stats[-1]
        acc = np.asarray(st.acceptance_rate, np.float64)
        rec.update({
            "accept_mean": round(float(acc.mean()), 4),
            "accept_q10": round(float(np.percentile(acc, 10)), 4),
            "div_frac": round(float(np.mean(
                np.asarray(st.termination) == int(Termination.DIVERGENCE))), 5),
            "depth_mean": round(float(np.mean(np.asarray(st.depth))), 2),
        })
    rec["raw_phi"] = {"mean": round(float(q[:, 0].mean()), 4),
                      "sd": round(float(q[:, 0].std()), 4), **_q(q[:, 0])}
    rec["log_s"] = {"mean": round(float(q[:, 1].mean()), 4),
                    "sd": round(float(q[:, 1].std()), 4), **_q(q[:, 1])}
    rec["logp"] = {**_q(lp, (1, 50, 99)), "max": round(float(lp.max()), 1)}
    rec["metric"] = metric_diag(state.metric)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=10240)
    ap.add_argument("--policy", default="auto", choices=["auto", "off", "tree"])
    ap.add_argument("--t", type=int, default=1000)
    ap.add_argument("--tag", default=None)
    ap.add_argument("--seed", type=int, default=5)
    ap.add_argument("--doublings", type=int, default=4)
    # small chunks: the tunnel kills multi-minute device calls (DESIGN #8),
    # and a 50-transition dense chunk at 10240 x 1002 exceeds that
    ap.add_argument("--tuning-chunk", type=int, default=15)
    ap.add_argument("--probe-chains", type=int, default=2048)
    ap.add_argument("--probe-transitions", type=int, default=600)
    ap.add_argument("--probe-block", type=int, default=10)
    ap.add_argument("--chunk-hook", action="store_true",
                    help="interleave per-coordinate ASIS between tuning "
                         "chunks (dispatch-level, sample.NUTSKernel.warmup "
                         "chunk_hook) so theta equilibrates DURING the "
                         "metric windows")
    ap.add_argument("--hook-steps", type=int, default=6,
                    help="ASIS MH sub-steps per chunk-hook invocation (the "
                         "hook fires only every tuning_chunk transitions, "
                         "so more sub-steps per firing than the fused "
                         "per-transition default)")
    ap.add_argument("--skip-warmup", action="store_true",
                    help="reuse .sv_diag_<tag>/warmup.npz, probe only")
    args = ap.parse_args()
    tag = args.tag or f"{args.chains}_{args.policy}"

    from inplacedhmc_tpu import diagnostics as diag
    import inplacedhmc_tpu.adapt.warmup as W
    from inplacedhmc_tpu.config import (DualAveraging, NUTS,
                                        default_warmup_stages)
    from inplacedhmc_tpu.core.state import WarmupState
    from inplacedhmc_tpu.models.stoch_vol import (make_asis_hook, stoch_vol,
                                                  synthetic_returns)
    from inplacedhmc_tpu.sample import _kernel
    from inplacedhmc_tpu.utils.checkpoint import (load_warmup_checkpoint,
                                                  save_warmup_checkpoint)

    returns = synthetic_returns(jax.random.PRNGKey(0), args.t, phi=0.98,
                                s=0.15, dtype=jnp.float32)
    model = stoch_vol(returns)
    out_dir = f".sv_diag_{tag}"
    os.makedirs(out_dir, exist_ok=True)
    records = {"tag": tag, "chains": args.chains, "policy": args.policy,
               "t": args.t, "windows": []}

    stages = default_warmup_stages(
        local_optimization=None,
        stepsize_adaptation=DualAveraging(delta=0.9),
        doubling_stages=args.doublings, metric="dense", stream=True)

    win_path = os.path.join(out_dir, "windows.jsonl")
    whook = (jax.jit(make_asis_hook(returns, per_coord=True,
                                    n_steps=args.hook_steps))
             if args.chunk_hook else None)
    records["chunk_hook"] = bool(args.chunk_hook)
    if not args.skip_warmup:
        kern = _kernel(model, NUTS(), True, None, use_pallas=args.policy)
        # per-stage resume: the tunnel worker crashes on long runs; each
        # completed stage persists (state + per-window record) and a rerun
        # skips it
        ck = os.path.join(out_dir, "warmup.npz")
        done_stages = 0
        if os.path.exists(os.path.join(out_dir, "stage.npz")):
            state, key, done_stages = load_warmup_checkpoint(
                os.path.join(out_dir, "stage.npz"))
            with open(win_path) as f:
                records["windows"] = [json.loads(l) for l in f if l.strip()]
            print(f"resuming after stage {done_stages}", flush=True)
        else:
            key = jax.random.PRNGKey(args.seed)
            key, k_init = jax.random.split(key)
            state = W.init_warmup_state(k_init, kern.potential, model.dim,
                                        args.chains, jnp.float32)
            records["windows"].append(window_record("init", state, [], 0.0))
            with open(win_path, "w") as f:
                f.write(json.dumps(records["windows"][-1]) + "\n")
            print(json.dumps(records["windows"][-1]), flush=True)
        for i, stage in enumerate(stages):
            if i < done_stages:
                continue
            key, k_s = jax.random.split(key)
            t0 = time.perf_counter()
            state, wstats = kern.warmup(k_s, state, [stage],
                                        tuning_chunk=args.tuning_chunk,
                                        sync_blocks=True, chunk_hook=whook)
            wall = time.perf_counter() - t0
            label = f"{i}:{type(stage).__name__}" + (
                f"(n={stage.n},metric={stage.metric})"
                if hasattr(stage, "n") else "")
            records["windows"].append(window_record(label, state, wstats, wall))
            with open(win_path, "a") as f:
                f.write(json.dumps(records["windows"][-1]) + "\n")
            print(json.dumps(records["windows"][-1]), flush=True)
            save_warmup_checkpoint(os.path.join(out_dir, "stage.npz"), state,
                                   key, i + 1)
        save_warmup_checkpoint(ck, state, key, len(stages))
    else:
        state, key, _ = load_warmup_checkpoint(
            os.path.join(out_dir, "warmup.npz"))
        if os.path.exists(win_path):
            with open(win_path) as f:
                records["windows"] = [json.loads(l) for l in f if l.strip()]
        else:
            records["windows"] = "skipped (reused warmup.npz)"

    # ---- fixed-kernel mixing probe (engine-independent: XLA tree) ----------
    pc = args.probe_chains
    from inplacedhmc_tpu.core.state import EvalPoint
    z = EvalPoint(q=jnp.asarray(state.z.q[:pc]),
                  logp=jnp.asarray(state.z.logp[:pc]),
                  grad=jnp.asarray(state.z.grad[:pc]))
    pstate = WarmupState(z=z, metric=state.metric, log_eps=state.log_eps)
    pkern = _kernel(model, NUTS(), True, None, use_pallas="off")
    block = pkern._sampling_fn(args.probe_block, 1, (0, 1))
    hook = jax.jit(make_asis_hook(returns, per_coord=True))

    key = jax.random.PRNGKey(args.seed + 1000)
    n_blocks = args.probe_transitions // args.probe_block
    draws = np.empty((args.probe_transitions, pc, 2), np.float32)
    acc = 0.0
    t0 = time.perf_counter()
    z_cur = pstate.z
    for b in range(n_blocks):
        key, k_n, k_h = jax.random.split(key, 3)
        blk = block(k_n, pstate._replace(z=z_cur))
        z_cur = hook(k_h, blk.z)
        draws[b * args.probe_block:(b + 1) * args.probe_block] = \
            np.asarray(blk.draws)
        acc += float(jnp.sum(blk.stats.acceptance_rate))
        float(jnp.sum(z_cur.logp))   # dispatch fence (tunnel queue)
    probe_wall = time.perf_counter() - t0

    d = jnp.asarray(draws)
    ess = np.asarray(diag.ess_bulk(d, cap=False))
    rhat = np.asarray(diag.split_rhat(d))
    n_tc = args.probe_transitions * pc
    records["probe"] = {
        "chains": pc, "transitions": args.probe_transitions,
        "engine": "xla", "asis": "per_coord(split,K=1)",
        "wall_s": round(probe_wall, 1),
        "eps": round(float(np.exp(np.asarray(state.log_eps))), 5),
        "accept": round(acc / n_tc, 4),
        "tau_phi": round(n_tc / max(float(ess[0]), 1), 1),
        "tau_logs": round(n_tc / max(float(ess[1]), 1), 1),
        "rhat_phi": round(float(rhat[0]), 4),
        "rhat_logs": round(float(rhat[1]), 4),
    }
    print(json.dumps(records["probe"]), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f"sv_warmup_diag_{tag}.json")
    with open(out, "w") as f:
        json.dump(records, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
