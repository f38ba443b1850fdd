"""Virtual-mesh scaling rehearsal (round-4 verdict #3: kill the 8-device dip).

What a virtual CPU mesh CAN and CANNOT measure: the ``--xla_force_host_
platform_device_count`` devices share one socket (this host: 4 cores), so a
weak-scaling ESS/s curve saturates at ``min(n_devices, n_cores)`` by
construction — the round-2 curve's "8-device regression" (4 devices 4.17x,
8 devices 2.46x) was 8 virtual devices' worth of chain work contending for 4
cores, not a GSPMD pathology.  What the rehearsal is FOR — validating that
the sharded program keeps the chain axis embarrassingly parallel (no
replication creep, no serialization, no per-transition collectives in the
sampling loop) — is measured here directly, three ways:

1. **Partition audit** (mechanical): compile the sharded sampling executable
   at 8 devices and assert from the SPMD-partitioned HLO that (a) the
   per-device chain dimension is C/8 (state and draw buffers are divided,
   not replicated) and (b) the sampling program contains ZERO cross-device
   collectives (pooled adaptation collectives belong to warmup only — their
   count is reported for context).
2. **Fixed-total-work curve**: total chains held constant while the mesh
   grows.  XLA CPU executes one device's program on ~one core for this
   workload, so the ideal wall HALVES per mesh doubling until nd reaches
   the core count, then flattens; monotone-decreasing-then-flat certifies
   that partitioning adds no serialization, while a pathological dip (the
   round-2 artifact) would show as wall GROWTH past the core cap.
3. **Weak-scaling curve** (context, core-capped): chains-per-device fixed;
   ideal speedup on this host is ``min(nd, n_cores)``, and the curve is
   judged against that, not against nd.

Measured finding the audit surfaces (kept in the JSON): the GSPMD-sharded
XLA-tree sampling program carries THREE all-reduces — the lockstep
while-loops' global any-active termination predicates.  They are 1-element
reductions, but they execute per loop iteration, i.e. per tree level; on a
multi-host mesh that is a latency-bound sync in the hot loop.  The
whole-tree Pallas path avoids them by construction (shard_map: each device
loops over its local chains and exits independently) — one more reason the
kernel path is the production configuration at scale.

Usage: python benchmarks/scaling_curve.py [--chains-per-dev 256] [--draws 256]
Writes benchmarks/scaling_results.json.
"""

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(r"{here}"))
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from inplacedhmc_tpu import diagnostics as diag
from inplacedhmc_tpu.config import DualAveraging, default_warmup_stages
from inplacedhmc_tpu.models import std_normal
from inplacedhmc_tpu.parallel.mesh import make_chain_mesh
from inplacedhmc_tpu.sample import sample

nd = {nd}
weak_chains = {weak_chains}
fixed_chains = {fixed_chains}
draws = {draws}
audit = {audit}
assert len(jax.devices()) == nd, jax.devices()
model = std_normal(50)
stages = default_warmup_stages(
    stepsize_adaptation=DualAveraging(), init_steps=50, middle_steps=50,
    doubling_stages=2, terminating_steps=50)
mesh = make_chain_mesh()
out = {{"n_devices": nd}}

def timed(chains, seed):
    # compile + warmup pass (untimed), then a timed steady-state run
    res = sample(jax.random.PRNGKey(seed), model, draws, chains, mesh=mesh,
                 warmup_stages=stages)
    float(jnp.sum(res.draws))
    t0 = time.perf_counter()
    res2 = sample(jax.random.PRNGKey(seed + 1), model, draws, chains,
                  mesh=mesh, warmup_stages=stages)
    float(jnp.sum(res2.draws))
    wall = time.perf_counter() - t0
    ess = np.asarray(diag.ess_bulk(res2.draws, cap=False))
    return {{"chains": chains, "draws": draws, "wall_s": round(wall, 2),
             "ess_min_per_s": round(float(ess.min()) / wall, 1),
             "ess_mean_per_s": round(float(ess.mean()) / wall, 1)}}

out["weak"] = timed(weak_chains, 0)
out["fixed_work"] = timed(fixed_chains, 100)

if audit:
    # SPMD-partition audit of the SAMPLING executable (no warmup): per-device
    # chain rows must be C/nd and the hot loop must contain no collectives
    import inplacedhmc_tpu.adapt.warmup as W
    from inplacedhmc_tpu.config import NUTS
    from inplacedhmc_tpu.parallel.mesh import shard_state
    from inplacedhmc_tpu.sample import _kernel
    kern = _kernel(model, NUTS(), True, None, use_pallas="off")
    state = W.init_warmup_state(jax.random.PRNGKey(0), kern.potential,
                                model.dim, fixed_chains, jnp.float32, eps=0.5)
    with mesh:
        sstate = shard_state(state, mesh, fixed_chains)
        compiled = kern._sampling_fn(draws).lower(
            jax.random.PRNGKey(1), sstate).compile()
    txt = compiled.as_text()
    colls = {{k: txt.count(k) for k in
             ("all-reduce", "all-gather", "reduce-scatter",
              "collective-permute", "all-to-all")}}
    local_c = fixed_chains // nd
    shard_shape = f"f32[{{local_c}},50]"
    out["audit"] = {{
        "sampling_collectives": colls,
        "sampling_collective_total": int(sum(colls.values())),
        "per_device_chain_rows": local_c,
        "state_is_partitioned": shard_shape in txt,
        "replicated_full_state": f"f32[{{fixed_chains}},50]" in txt,
    }}
print(json.dumps(out))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains-per-dev", type=int, default=256)
    ap.add_argument("--fixed-chains", type=int, default=1024)
    ap.add_argument("--draws", type=int, default=256)
    args = ap.parse_args()

    n_cores = os.cpu_count() or 1
    rows = []
    for nd in (1, 2, 4, 8):
        code = WORKER.format(here=os.path.join(HERE, "x"), nd=nd,
                             weak_chains=args.chains_per_dev * nd,
                             fixed_chains=args.fixed_chains,
                             draws=args.draws, audit=(nd == 8))
        env = dict(os.environ,
                   XLA_FLAGS=f"--xla_force_host_platform_device_count={nd}",
                   JAX_PLATFORMS="cpu")
        # XLA CPU's cross-device collectives carry a stuck-participant
        # watchdog that can fire spuriously under transient host contention
        # (observed: AllGather AwaitAndLogIfStuck crash on a run that passes
        # standalone) — retry the arm before declaring failure
        for attempt in range(3):
            out = subprocess.run([sys.executable, "-c", code], env=env,
                                 capture_output=True, text=True, timeout=3600)
            if out.returncode == 0:
                break
            print(f"worker nd={nd} attempt {attempt + 1} failed "
                  f"(retrying): {out.stderr.strip().splitlines()[-1][:120]}",
                  file=sys.stderr, flush=True)
        else:
            print(out.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"worker nd={nd} failed")
        rec = json.loads(out.stdout.strip().splitlines()[-1])
        rows.append(rec)
        print(json.dumps(rec), flush=True)

    weak_base = rows[0]["weak"]["ess_mean_per_s"]
    fixed_base = rows[0]["fixed_work"]["wall_s"]
    audit = None
    for r in rows:
        r["weak"]["speedup_vs_1dev"] = round(
            r["weak"]["ess_mean_per_s"] / weak_base, 2)
        r["weak"]["ideal_given_cores"] = min(r["n_devices"], n_cores)
        r["fixed_work"]["overhead_vs_1dev"] = round(
            r["fixed_work"]["wall_s"] / fixed_base, 2)
        audit = r.pop("audit", audit)

    result = {
        "host_cores": n_cores,
        "note": ("virtual CPU mesh: all devices share one socket; weak "
                 "scaling is core-capped at min(nd, host_cores) by "
                 "construction (the round-2 'dip' was this), so the "
                 "embarrassing-parallelism claim is certified by the "
                 "fixed-work overhead curve (ideal 1.0) and the partition "
                 "audit, not by weak-scaling speedup"),
        "arms": rows,
        "audit_8dev": audit,
    }
    with open(os.path.join(HERE, "scaling_results.json"), "w") as f:
        json.dump(result, f, indent=1)
    print("weak speedups:", [r["weak"]["speedup_vs_1dev"] for r in rows],
          "(ideal:", [r["weak"]["ideal_given_cores"] for r in rows], ")")
    print("fixed-work overhead:",
          [r["fixed_work"]["overhead_vs_1dev"] for r in rows])
    if audit:
        print("audit:", json.dumps(audit))


if __name__ == "__main__":
    main()
