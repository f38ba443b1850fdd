"""Virtual-mesh scaling rehearsal: ESS/s at 1/2/4/8 devices (round-1 verdict
item 6; the rehearsal for the >=9x 1->16-host target in BASELINE.json).

Weak scaling: chains-per-device held fixed, the mesh grows, so ideal scaling
doubles total ESS/s with each doubling of the mesh.  On the virtual CPU mesh
the devices share one socket, so the curve mostly validates that the GSPMD
program keeps the chain axis embarrassingly parallel (no serialization or
replication creep) rather than demonstrating real speedup — that needs pod
time (docs/ROADMAP.md #3).

Each mesh size runs in a subprocess because the virtual device count is fixed
at backend initialization.

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
chains = {chains}
draws = {draws}
assert len(jax.devices()) == nd, jax.devices()
model = std_normal(50)
stages = default_warmup_stages(
    stepsize_adaptation=DualAveraging(), init_steps=50, middle_steps=50,
    doubling_stages=2, terminating_steps=50)
mesh = make_chain_mesh()
# compile + warmup pass (untimed), then a timed steady-state sampling run
res = sample(jax.random.PRNGKey(0), model, draws, chains, mesh=mesh,
             warmup_stages=stages)
float(jnp.sum(res.draws))
t0 = time.perf_counter()
res2 = sample(jax.random.PRNGKey(1), model, draws, chains, mesh=mesh,
              warmup_stages=stages)
float(jnp.sum(res2.draws))
wall = time.perf_counter() - t0
ess = np.asarray(diag.ess_bulk(res2.draws, cap=False))
print(json.dumps({{"n_devices": nd, "chains": chains, "draws": draws,
                   "wall_s": round(wall, 2),
                   "ess_min_per_s": round(float(ess.min()) / wall, 1),
                   "ess_mean_per_s": round(float(ess.mean()) / wall, 1)}}))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains-per-dev", type=int, default=256)
    ap.add_argument("--draws", type=int, default=256)
    args = ap.parse_args()

    results = []
    for nd in (1, 2, 4, 8):
        code = WORKER.format(here=os.path.join(HERE, "x"), nd=nd,
                             chains=args.chains_per_dev * nd,
                             draws=args.draws)
        env = dict(os.environ,
                   XLA_FLAGS=f"--xla_force_host_platform_device_count={nd}",
                   JAX_PLATFORMS="cpu")
        out = subprocess.run([sys.executable, "-c", code], env=env,
                             capture_output=True, text=True, timeout=3600)
        if out.returncode != 0:
            print(out.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"worker nd={nd} failed")
        line = out.stdout.strip().splitlines()[-1]
        rec = json.loads(line)
        results.append(rec)
        print(json.dumps(rec))

    base = results[0]["ess_mean_per_s"]
    for r in results:
        r["speedup_vs_1dev"] = round(r["ess_mean_per_s"] / base, 2)
    with open(os.path.join(HERE, "scaling_results.json"), "w") as f:
        json.dump(results, f, indent=1)
    print("speedups:", [r["speedup_vs_1dev"] for r in results])


if __name__ == "__main__":
    main()
