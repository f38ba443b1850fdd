"""Toolchain canary: is the remote Mosaic/XLA compile helper healthy?

Two load-bearing workarounds in this repo exist solely because specific
compiles crash or wedge the environment's REMOTE compile helper (not our
code — the same programs compiled in earlier rounds):

* every ``n_sweep > 1 x block_c >= 1024`` whole-tree kernel build crashes it
  (HTTP 500 / subprocess exit 1 after ~12 min; docs/DESIGN.md #10d) — so the
  flagship bench ships sweep-off;
* any program fusing the ASIS hook into the 10,240-chain SV sampling scan
  wedges it (>25 min, killed; DESIGN #12.3) — so ``sv_split_driver.py``
  composes the hook at dispatch level.

This probe attempts those exact builds (plus matching positive controls that
SHOULD compile) in subprocesses under a timeout and records pass/fail/wall
per build with a toolchain fingerprint, so the next session can tell
"toolchain regressed/recovered" from "our code broke" in minutes
(VERDICT r4 next #8).

Run (TPU): python benchmarks/toolchain_probe.py [--timeout 1200] [--full]
Writes benchmarks/toolchain_probe.json.
"""

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

TREE_PROBE = r"""
import jax, jax.numpy as jnp, sys
sys.path.insert(0, {repo!r})
from inplacedhmc_tpu.ops.tree_pallas import make_gaussian_tree_transition
from inplacedhmc_tpu.core.metric import diag_metric
dim = 100
metric = diag_metric(jnp.ones((dim,)))
trans, run_padded = make_gaussian_tree_transition(
    jnp.ones((dim,)), metric, block_c={bc}, refresh_inside=True,
    padded_io=True, n_sweep={sweep})
cpad = {bc}
q = jnp.zeros((cpad, 128), jnp.float32)
eps = jnp.full((cpad, 1), 0.25, jnp.float32)
valid = jnp.ones((cpad, 1), jnp.int32)
fn = jax.jit(run_padded)
fn.lower(jax.random.PRNGKey(0), q, eps, valid).compile()
print("COMPILED")
"""

ASIS_PROBE = r"""
import jax, jax.numpy as jnp, sys
sys.path.insert(0, {repo!r})
from inplacedhmc_tpu.config import NUTS
from inplacedhmc_tpu.models.stoch_vol import (make_asis_hook, stoch_vol,
                                              synthetic_returns)
from inplacedhmc_tpu.sample import _kernel
import inplacedhmc_tpu.adapt.warmup as W
returns = synthetic_returns(jax.random.PRNGKey(0), 1000, phi=0.98, s=0.15,
                            dtype=jnp.float32)
model = stoch_vol(returns)
kern = _kernel(model, NUTS(), True, None,
               post_step=make_asis_hook(returns, per_coord=True))
state = W.init_warmup_state(jax.random.PRNGKey(0), kern.potential, model.dim,
                            {chains}, jnp.float32, eps=0.1)
fn = kern._sampling_fn(4, 1, (0, 1))
fn.lower(jax.random.PRNGKey(1), state).compile()
print("COMPILED")
"""


def probe(name, code, timeout):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)   # run on the real backend
    t0 = time.perf_counter()
    try:
        out = subprocess.run([sys.executable, "-c", code], env=env,
                             capture_output=True, text=True, timeout=timeout)
        ok = out.returncode == 0 and "COMPILED" in out.stdout
        err = "" if ok else (out.stderr.strip().splitlines() or ["?"])[-1][:300]
        status = "ok" if ok else "compile_error"
    except subprocess.TimeoutExpired:
        ok, err, status = False, f"timeout after {timeout}s", "wedge_timeout"
    rec = {"probe": name, "ok": ok, "status": "ok" if ok else status,
           "wall_s": round(time.perf_counter() - t0, 1), "error": err}
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=int, default=1200)
    ap.add_argument("--full", action="store_true",
                    help="probe the full n_sweep x block_c matrix")
    ap.add_argument("--controls-only", action="store_true",
                    help="run only the positive controls; record the wedge "
                         "probes as not_attempted (the wedge builds can "
                         "take the shared worker down — skip them when "
                         "other jobs need it)")
    args = ap.parse_args()

    probes = [
        # positive controls (must pass; failure = general toolchain outage)
        ("tree_sweep16_bc512", TREE_PROBE.format(repo=REPO, bc=512, sweep=16)),
        ("asis_fused_c1024", ASIS_PROBE.format(repo=REPO, chains=1024)),
        # known round-4 walls (failure here = the wall still stands;
        # success = the toolchain recovered, re-enable the sweep/fused paths)
        ("tree_sweep4_bc1024", TREE_PROBE.format(repo=REPO, bc=1024, sweep=4)),
        ("asis_fused_c10240", ASIS_PROBE.format(repo=REPO, chains=10240)),
    ]
    if args.full:
        probes += [
            ("tree_sweep4_bc2048", TREE_PROBE.format(repo=REPO, bc=2048,
                                                     sweep=4)),
            ("tree_sweep16_bc1024", TREE_PROBE.format(repo=REPO, bc=1024,
                                                      sweep=16)),
        ]

    import jax
    fingerprint = {"jax": jax.__version__,
                   "backend": jax.default_backend(),
                   "device": str(jax.devices()[0])}
    try:
        import jaxlib
        fingerprint["jaxlib"] = jaxlib.__version__
    except Exception:
        pass

    rows = []
    for n, c in probes:
        is_wedge = "sweep4" in n or "c10240" in n or "sweep16_bc1024" in n
        if args.controls_only and is_wedge:
            rows.append({"probe": n, "ok": None, "status": "not_attempted",
                         "wall_s": 0.0,
                         "error": "controls-only run (wedge probes can "
                                  "take the shared worker down)"})
            print(json.dumps(rows[-1]), flush=True)
            continue
        rows.append(probe(n, c, args.timeout))
    wedge_rows = [r for r in rows
                  if "sweep4" in r["probe"] or "c10240" in r["probe"]]
    if any(r["status"] == "not_attempted" for r in wedge_rows):
        verdict = "controls_only"
    elif all(r["ok"] for r in wedge_rows):
        verdict = "toolchain_recovered"
    else:
        verdict = "walls_standing"
    out = {"fingerprint": fingerprint, "timeout_s": args.timeout,
           "probes": rows, "verdict": verdict}
    path = os.path.join(HERE, "toolchain_probe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}: {out['verdict']}")


if __name__ == "__main__":
    main()
