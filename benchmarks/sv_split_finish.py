"""Emit the config-5 result line from a (possibly partial) split-driver run.

The split driver checkpoints its streamed split-moments, running stat sums
and memmapped draws every few minutes (`sv_split_driver.py`); this reads
those artifacts and computes the same JSON record over the COMPLETED
transitions — so a run cut short by the wall clock or a worker crash still
yields its R-hat/ESS evidence.

Run: python benchmarks/sv_split_finish.py --dir .sv10k_r5 [--wall-s N]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# host-side analysis only — never touch the (possibly busy) TPU tunnel;
# the container pre-registers the axon backend before env vars can apply,
# so the platform must be forced on the live config
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=".sv10k_r5")
    ap.add_argument("--hook-every", type=int, default=2)
    ap.add_argument("--wall-s", type=float, default=None,
                    help="sampling wall seconds (from the driver log) for "
                         "the ess/s field; omitted -> null")
    ap.add_argument("--rhat-only", action="store_true",
                    help="skip the CPU-heavy ESS pass (mid-run peeks)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from inplacedhmc_tpu import diagnostics as diag
    from inplacedhmc_tpu.adapt.warmup import SplitMoments

    ck = np.load(os.path.join(args.dir, "split_state.npz"))
    draws = np.lib.format.open_memmap(os.path.join(args.dir, "draws.npy"),
                                      mode="r")
    K = args.hook_every
    done_t = int(ck["i"]) * K
    chains = draws.shape[1]
    assert done_t > 0, "no completed sampling blocks in the checkpoint"
    mom = SplitMoments(qref=jnp.asarray(ck["m_qref"]),
                       cnt=jnp.asarray(ck["m_cnt"]),
                       s1=jnp.asarray(ck["m_s1"]), s2=jnp.asarray(ck["m_s2"]))
    rhat = np.asarray(diag.split_rhat_from_moments(mom))
    if args.rhat_only:
        # the streamed split-moments cover fixed global halves, so they are
        # NaN until the run crosses its midpoint — peek from the kept-coord
        # draws instead (exact split-rhat over phi, log_s, h1..)
        dk = jnp.asarray(np.asarray(draws[:done_t]))
        rk = np.asarray(diag.split_rhat(dk))
        print(json.dumps({"transitions": done_t,
                          "rhat_kept_max": round(float(rk.max()), 4),
                          "rhat_phi": round(float(rk[0]), 4),
                          "rhat_logs": round(float(rk[1]), 4)}))
        return
    d = jnp.asarray(np.asarray(draws[:done_t]))

    def chunked(fn, x, bs=4):
        return np.concatenate([np.asarray(fn(x[:, :, i:i + bs]))
                               for i in range(0, x.shape[-1], bs)])

    ess_kept = chunked(lambda x: diag.ess_bulk(x, cap=False), d)
    n_tc = done_t * chains
    out = {
        "chains": chains, "transitions": done_t,
        "planned_transitions": int(draws.shape[0]),
        "partial": done_t < draws.shape[0],
        "thin": 1, "metric": "dense", "delta": 0.9, "stream": True,
        "asis": "per_coord", "asis_hook_every": K,
        "wall_s": args.wall_s,
        "rhat_max": round(float(rhat.max()), 4),
        "rhat_phi": round(float(rhat[0]), 4),
        "rhat_logs": round(float(rhat[1]), 4),
        "rhat_h_max": round(float(rhat[2:].max()), 4),
        "ess_scope": f"phi,log_s,h1..h{draws.shape[2] - 2}",
        "ess_min": round(float(ess_kept.min()), 1),
        "ess_phi": round(float(ess_kept[0]), 1),
        "ess_logs": round(float(ess_kept[1]), 1),
        "tau_phi": round(n_tc / max(float(ess_kept[0]), 1), 1),
        "tau_logs": round(n_tc / max(float(ess_kept[1]), 1), 1),
        "acc_note": "acceptance/depth sums live in the driver's final "
                    "result.json when it completes",
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
