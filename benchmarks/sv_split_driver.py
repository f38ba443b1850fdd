"""Config-5 continuation with ASIS as a SEPARATE device program.

This environment's remote Mosaic/XLA compile helper reproducibly wedges
(>25 min, then killed) on any program that fuses the ASIS hook into the
10,240-chain sampling scan — joint and per-coordinate alike — while the
hook-free sampling program and the hook ALONE each compile in minutes
(measured 2026-08-20; the round-3 environment compiled the fused joint-hook
program fine, so this is a toolchain regression, not a code change).  The
algorithmic composition is dispatch-order, not compile-unit, so this driver
alternates two independently compiled programs at the Python level:

  [K NUTS transitions]  ->  [per-coordinate ASIS hook]  ->  ...

Both kernels leave the posterior invariant, so hook-every-K is a valid
composition for any K; K=2 keeps the hook cadence close to the A/B's
every-transition setting (benchmarks/asis_ab.json: tau_phi 6.7,
tau_logs 19.4 at K=1 — tau scales at most ~K in transition units) while
halving the per-call dispatch tax.  Streamed split-chain moments thread
through the NUTS blocks exactly as in `run_sampling` (the recorded draws are
the pre-hook states — also exact posterior draws; R-hat/ESS then measure the
interleaved chain's mixing conservatively).

Run: python benchmarks/sv_split_driver.py --from-dir .sv10k_r4 \
       --out-dir .sv10k_r4_cont --transitions 4000 --hook-every 2
Appends one JSON line (the examples/results_round4.jsonl record) to stdout
and writes <out-dir>/result.json.
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
    ap.add_argument("--from-dir", default=".sv10k_r4")
    ap.add_argument("--warmup-dir", default=None)
    ap.add_argument("--out-dir", default=".sv10k_r4_cont")
    ap.add_argument("--t", type=int, default=1000)
    ap.add_argument("--chains", type=int, default=10240)
    ap.add_argument("--transitions", type=int, default=4000)
    ap.add_argument("--burn", type=int, default=0,
                    help="transitions (hook active) before moment/draw "
                         "accumulation starts — decorrelates a warm-seeded "
                         "ensemble (e.g. pilot positions tiled across "
                         "chains) before R-hat bookkeeping begins")
    ap.add_argument("--hook-every", type=int, default=2)
    ap.add_argument("--asis", default="per_coord",
                    choices=["per_coord", "joint", "none"],
                    help="ASIS arm: per-coordinate MH (default), joint "
                         "proposal, or no hook — the 10k-scale A/B the "
                         "round-3 per-coordinate design decision rests on")
    ap.add_argument("--hook-steps", type=int, default=3,
                    help="MH sub-steps per hook invocation; tau_theta in "
                         "transition units scales ~1/(sub-steps per "
                         "transition) until the NUTS h-refresh becomes "
                         "binding, and split-Rhat's floor is ~1 + tau/N — "
                         "more sub-steps buy rhat convergence directly")
    ap.add_argument("--n-keep", type=int, default=10,
                    help="leading coordinates recorded for ESS")
    ap.add_argument("--seed", type=int, default=23)
    ap.add_argument("--checkpoint-every-s", type=float, default=600.0)
    ap.add_argument("--progress-every", type=int, default=50)
    args = ap.parse_args()

    from inplacedhmc_tpu import diagnostics as diag
    import inplacedhmc_tpu.adapt.warmup as W
    from inplacedhmc_tpu.config import NUTS
    from inplacedhmc_tpu.core.state import WarmupState
    from inplacedhmc_tpu.models.stoch_vol import (make_asis_hook, stoch_vol,
                                                  synthetic_returns)
    from inplacedhmc_tpu.sample import _kernel
    from inplacedhmc_tpu.utils.checkpoint import (load_lean_checkpoint,
                                                  load_warmup_checkpoint)

    returns = synthetic_returns(jax.random.PRNGKey(0), args.t, phi=0.98,
                                s=0.15, dtype=jnp.float32)
    model = stoch_vol(returns)
    wstate, _, _ = load_warmup_checkpoint(
        os.path.join(args.warmup_dir or args.from_dir, "warmup.npz"))
    resumed = load_lean_checkpoint(os.path.join(args.from_dir, "sample.npz"))
    split_prev = os.path.join(args.from_dir, "split_state.npz")
    if resumed is not None:
        z = jax.tree_util.tree_map(jnp.asarray, resumed[0])
        src = "sample checkpoint"
    elif os.path.exists(split_prev) and args.from_dir != args.out_dir:
        # chain from a finished split run's end state (e.g. the A/B arms
        # both starting from the headline's well-equilibrated ensemble)
        from inplacedhmc_tpu.core.hamiltonian import (
            batched_logdensity_and_grad, evaluate)
        prev = np.load(split_prev)
        z = evaluate(batched_logdensity_and_grad(model.logp),
                     jnp.asarray(prev["q"]))
        src = "previous split run's end state"
    else:
        # fresh-warmup start (round-5 headline: NO continuation/pilot
        # dependency — the ensemble is the warmup's own final state)
        z = wstate.z
        src = "warmup state (fresh, no continuation)"
    state = WarmupState(z=z, metric=wstate.metric, log_eps=wstate.log_eps)
    print(f"starting from {args.from_dir} ({src}): z {z.q.shape}, "
          f"eps {float(jnp.exp(jnp.atleast_1d(state.log_eps))[0]):.4g}",
          flush=True)

    K = args.hook_every
    n_blocks = args.transitions // K
    kd = tuple(range(args.n_keep))
    kern = _kernel(model, NUTS(), True, None)          # hook-free programs
    nuts_block = kern._sampling_fn(K, 1, kd, True, args.transitions)
    if args.asis == "none":
        hook = jax.jit(lambda k, z: z)
    else:
        hook = jax.jit(make_asis_hook(
            returns, per_coord=args.asis == "per_coord",
            n_steps=args.hook_steps))

    os.makedirs(args.out_dir, exist_ok=True)
    draws_path = os.path.join(args.out_dir, "draws.npy")
    ck_path = os.path.join(args.out_dir, "split_state.npz")
    shape = (args.transitions, args.chains, args.n_keep)
    from inplacedhmc_tpu.adapt.warmup import SplitMoments
    from inplacedhmc_tpu.core.hamiltonian import evaluate

    # ---- resumable progress (the tunnel worker crashes under sustained
    # load; every block is cheap to redo, the run is not) ----------------
    acc_sum = depth_sum = 0.0
    div_sum = steps_sum = 0
    burn_done = 0
    i0 = 0
    mom = None
    key = jax.random.PRNGKey(args.seed)
    if os.path.exists(ck_path) and os.path.exists(draws_path):
        ck = np.load(ck_path)
        draws = np.lib.format.open_memmap(draws_path, mode="r+")
        assert draws.shape == shape, (draws.shape, shape)
        z_cur = evaluate(kern.potential, jnp.asarray(ck["q"]))
        key = jnp.asarray(ck["key"])
        burn_done, i0 = int(ck["burn_b"]), int(ck["i"])
        acc_sum, depth_sum = float(ck["acc_sum"]), float(ck["depth_sum"])
        div_sum, steps_sum = int(ck["div_sum"]), int(ck["steps_sum"])
        if bool(ck["has_mom"]):
            mom = SplitMoments(qref=jnp.asarray(ck["m_qref"]),
                               cnt=jnp.asarray(ck["m_cnt"]),
                               s1=jnp.asarray(ck["m_s1"]),
                               s2=jnp.asarray(ck["m_s2"]))
        print(f"[split] resumed: burn {burn_done * K}/{args.burn}, "
              f"block {i0}/{n_blocks}", flush=True)
    else:
        draws = np.lib.format.open_memmap(draws_path, mode="w+",
                                          dtype=np.float32, shape=shape)
        z_cur = state.z

    def save_ck(burn_b, i):
        tmp = ck_path + ".tmp.npz"
        payload = dict(q=np.asarray(z_cur.q), key=np.asarray(key),
                       burn_b=burn_b, i=i, acc_sum=acc_sum,
                       depth_sum=depth_sum, div_sum=div_sum,
                       steps_sum=steps_sum, has_mom=mom is not None)
        if mom is not None:
            payload.update(m_qref=np.asarray(mom.qref),
                           m_cnt=np.asarray(mom.cnt),
                           m_s1=np.asarray(mom.s1), m_s2=np.asarray(mom.s2))
        np.savez(tmp, **payload)
        draws.flush()
        os.replace(tmp, ck_path)

    t0 = time.perf_counter()
    last_ck = t0
    for b in range(burn_done, args.burn // K):
        key, k_nuts, k_hook = jax.random.split(key, 3)
        blk = nuts_block(k_nuts, state._replace(z=z_cur), None, 0)
        z_cur = hook(k_hook, blk.z)
        # value-fetch fence: without it the whole burn loop enqueues
        # asynchronously and the tunnel's dispatch queue grows unboundedly
        # (the sync_blocks hazard, docs/DESIGN.md §8)
        float(jnp.sum(z_cur.logp))
        if (b + 1) % args.progress_every == 0:
            print(f"[split] burn {(b + 1) * K}/{args.burn}", flush=True)
        if time.perf_counter() - last_ck > args.checkpoint_every_s:
            save_ck(b + 1, 0)
            last_ck = time.perf_counter()
    if args.burn:
        print(f"[split] burn-in done ({args.burn} transitions, "
              f"{time.perf_counter() - t0:.0f}s)", flush=True)
        t0 = time.perf_counter()
    from inplacedhmc_tpu.core.state import Termination

    @jax.jit
    def stat_vec(st):
        # ONE small fetch per block instead of four: each host value fetch
        # is a full tunnel round trip (~0.1-0.2 s), and at 2 transitions
        # per block the per-block fetch tax dominates the sampling rate
        return jnp.stack([
            jnp.sum(st.acceptance_rate),
            jnp.sum(st.depth.astype(jnp.float32)),
            jnp.sum(st.steps.astype(jnp.int32)).astype(jnp.float32),
            jnp.sum((st.termination == Termination.DIVERGENCE)
                    .astype(jnp.int32)).astype(jnp.float32)])

    for i in range(i0, n_blocks):
        key, k_nuts, k_hook = jax.random.split(key, 3)
        blk = nuts_block(k_nuts, state._replace(z=z_cur), mom, i * K)
        mom = blk.moments
        z_cur = hook(k_hook, blk.z)
        draws[i * K:(i + 1) * K] = np.asarray(blk.draws)
        sv = np.asarray(stat_vec(blk.stats), np.float64)
        acc_sum += float(sv[0])
        depth_sum += float(sv[1])
        steps_sum += int(sv[2])
        div_sum += int(sv[3])
        if (i + 1) % args.progress_every == 0:
            done = (i + 1 - i0) * K
            rate = done / (time.perf_counter() - t0)
            print(f"[split] {(i + 1) * K}/{args.transitions} transitions "
                  f"({rate:.2f}/s, ETA "
                  f"{(args.transitions - (i + 1) * K) / rate:.0f}s)",
                  flush=True)
        if time.perf_counter() - last_ck > args.checkpoint_every_s:
            save_ck(args.burn // K, i + 1)
            last_ck = time.perf_counter()
    wall = time.perf_counter() - t0

    rhat = np.asarray(diag.split_rhat_from_moments(mom))

    def chunked(fn, x, bs=4):
        return np.concatenate([np.asarray(fn(x[:, :, i:i + bs]))
                               for i in range(0, x.shape[-1], bs)])

    ess_kept = chunked(lambda d: diag.ess_bulk(d, cap=False),
                       jnp.asarray(draws))
    n_tc = args.transitions * args.chains
    out = {
        "t": args.t, "chains": args.chains, "transitions": args.transitions,
        "thin": 1, "metric": "dense", "delta": 0.9, "stream": True,
        ("continuation_of" if resumed is not None else "fresh_warmup"):
            args.from_dir,
        "asis": args.asis, "asis_hook_every": K,
        "asis_hook_steps": args.hook_steps, "burn": args.burn,
        "wall_s": round(wall, 1),
        "rhat_max": round(float(rhat.max()), 4),
        "rhat_phi": round(float(rhat[0]), 4),
        "rhat_logs": round(float(rhat[1]), 4),
        "rhat_h_max": round(float(rhat[2:].max()), 4),
        "ess_scope": f"phi,log_s,h1..h{args.n_keep - 2}",
        "ess_min": round(float(ess_kept.min()), 1),
        "ess_phi": round(float(ess_kept[0]), 1),
        "ess_logs": round(float(ess_kept[1]), 1),
        "ess_min_per_s": round(float(ess_kept.min()) / wall, 1),
        "tau_phi": round(n_tc / max(float(ess_kept[0]), 1), 1),
        "tau_logs": round(n_tc / max(float(ess_kept[1]), 1), 1),
        "accept": round(acc_sum / n_tc, 3),
        "depth_mean": round(depth_sum / n_tc, 2),
        "div_frac": round(div_sum / n_tc, 6),
    }
    print(json.dumps(out))
    with open(os.path.join(args.out_dir, "result.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
