"""Worker for the 2-process CPU rehearsal (tests/test_multiprocess.py).

Each process joins a 2-process JAX cluster (Gloo collectives over localhost),
builds the GLOBAL 8-device chain mesh, and drives run_sharded end-to-end with
per-process checkpointing; run a second time with the same arguments it
resumes from the finished checkpoint (exercising the local-rows ->
make_array_from_process_local_data reglobalization path).  Prints one JSON
line of replicated diagnostics that the parent compares across processes.
"""

import json
import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
ckpt_dir = sys.argv[4]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from inplacedhmc_tpu.parallel import multiprocess as mp  # noqa: E402

mp.initialize(coordinator_address=f"localhost:{port}",
              num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc
assert jax.device_count() == 4 * nproc

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from inplacedhmc_tpu.config import (DualAveraging,  # noqa: E402
                                    default_warmup_stages)
from inplacedhmc_tpu.models import std_normal  # noqa: E402
from inplacedhmc_tpu.parallel.mesh import make_chain_mesh, run_sharded  # noqa: E402

model = std_normal(6)
stages = default_warmup_stages(
    local_optimization=None, stepsize_adaptation=DualAveraging(),
    init_steps=20, middle_steps=15, doubling_stages=1, terminating_steps=15)
mesh = make_chain_mesh()  # all 8 global devices

res = run_sharded(
    jax.random.PRNGKey(0), model, n_draws=40, n_chains=16, mesh=mesh,
    warmup_stages=stages, use_pallas="off",
    draw_block=16, collect_moments=True, sync_blocks=True,
    warmup_checkpoint_path=os.path.join(ckpt_dir, "warmup.npz"),
    sample_checkpoint_path=os.path.join(ckpt_dir, "sample.npz"))

# local rows only: 16 chains / 2 processes
assert res.draws.shape == (40, 16 // nproc, 6), res.draws.shape

# replicated collective diagnostics — must be identical on every process.
# (sampling stats of a CHECKPOINTED run are host-local rows by design; the
# warmup stats stay on device as global arrays, so their mean is a collective)
from inplacedhmc_tpu import diagnostics as diag  # noqa: E402

acc = (float(jnp.mean(jnp.asarray(res.warmup_stats.acceptance_rate)))
       if res.warmup_stats is not None else -1.0)  # -1: resumed past warmup
rhat = diag.split_rhat_from_moments(res.sample_moments)
eps = float(jnp.exp(jnp.atleast_1d(res.warmup_state.log_eps))[0])
metric_sum = float(jnp.sum(res.warmup_state.metric.inv))
local_mean = float(np.mean(res.draws))

print("MPRESULT " + json.dumps({
    "proc": pid,
    "acc": round(acc, 6),
    "rhat_max": round(float(jnp.max(rhat)), 6),
    "eps": round(eps, 6),
    "metric_sum": round(metric_sum, 6),
    "local_mean": round(local_mean, 6),
    "warmup_ckpt": os.path.basename(
        mp.per_process_path(os.path.join(ckpt_dir, "warmup.npz"))),
}), flush=True)
