"""Multi-process (multi-host) scaffolding tests.

Two layers:

* pure-function unit tests of ``parallel.multiprocess`` helpers in the
  single-process regime (identity behavior);
* a REAL 2-process rehearsal (the closest this CI can get to a multi-host
  pod, SURVEY.md §4.4): two subprocesses join a JAX cluster over localhost
  (Gloo CPU collectives), each with 4 virtual devices, and drive
  ``run_sharded`` over the global 8-device chain mesh with per-process
  checkpointing — then run AGAIN to exercise the resume/reglobalization path.
  Matches the reference's full multi-worker surface (``mcmc.jl:130-159``) at
  the process level the reference never had.
"""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inplacedhmc_tpu.parallel import multiprocess as mp


def test_single_process_helpers_are_identity():
    assert mp.process_count() == 1
    assert mp.is_coordinator()
    assert mp.per_process_path("/x/y.npz") == "/x/y.npz"
    x = jnp.arange(12.0).reshape(3, 4)
    rows, off = mp.host_local_rows(x)
    assert off == 0
    np.testing.assert_array_equal(rows, np.asarray(x))
    np.testing.assert_array_equal(mp.to_host(x), np.asarray(x))
    y = mp.make_global_like(np.ones((3, 4)), x)
    np.testing.assert_array_equal(np.asarray(y), 1.0)


def test_host_local_rows_sharded_single_process():
    """On a single process every device shard is addressable: local rows are
    the whole array regardless of sharding."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = Mesh(np.asarray(devs), ("chain",))
    x = jax.device_put(jnp.arange(float(len(devs) * 3)).reshape(len(devs), 3),
                       NamedSharding(mesh, P("chain", None)))
    rows, off = mp.host_local_rows(x)
    assert off == 0
    np.testing.assert_array_equal(rows, np.asarray(x))


def _run_cluster(tmp_path, rerun: bool):
    port = 9955
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "_mp_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), "2", str(port), str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"
    results = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("MPRESULT ")]
        assert lines, out[-2000:]
        results.append(json.loads(lines[-1][len("MPRESULT "):]))
    return results


def test_two_process_rehearsal(tmp_path):
    results = _run_cluster(tmp_path, rerun=False)
    r0, r1 = sorted(results, key=lambda r: r["proc"])

    # collective diagnostics replicated bit-identically across processes
    for k in ("acc", "rhat_max", "eps", "metric_sum"):
        assert r0[k] == r1[k], (k, r0, r1)
    assert 0.6 < r0["acc"] < 0.99
    assert r0["rhat_max"] < 1.3
    # local draw shards differ (different chains)
    assert r0["local_mean"] != r1["local_mean"]
    # per-process checkpoint files — no shared-file races
    assert r0["warmup_ckpt"] == "warmup.proc0.npz"
    assert r1["warmup_ckpt"] == "warmup.proc1.npz"
    for i in range(2):
        assert os.path.exists(tmp_path / f"warmup.proc{i}.npz")
        assert os.path.exists(tmp_path / f"sample.proc{i}.npz")
        assert os.path.isdir(tmp_path / f"sample.proc{i}.npz.blocks")

    # second run with identical arguments resumes from the finished
    # checkpoints (warmup: stage skip; sampling: full-done resume through the
    # local-rows -> global reglobalization) and reproduces the diagnostics
    again = _run_cluster(tmp_path, rerun=True)
    a0, a1 = sorted(again, key=lambda r: r["proc"])
    for k in ("eps", "metric_sum", "local_mean"):
        assert a0[k] == r0[k], (k, a0, r0)
        assert a1[k] == r1[k], (k, a1, r1)
