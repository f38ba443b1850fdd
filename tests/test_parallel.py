"""Multi-device tests on the 8-device virtual CPU mesh (SURVEY.md §4.4).

Exercises both distribution paths: GSPMD (sharded arrays through jitted
stages, collectives inserted by XLA) and explicit shard_map + psum
(collectives.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from inplacedhmc_tpu import diagnostics as diag
from inplacedhmc_tpu.models import eight_schools, std_normal
from inplacedhmc_tpu.parallel.collectives import (ess_bulk_sharded,
                                                  pooled_acceptance,
                                                  split_rhat_sharded)
from inplacedhmc_tpu.parallel.mesh import (chain_spec, make_chain_mesh,
                                           run_sharded, shard_by_chain)
from inplacedhmc_tpu.sample import sample
from inplacedhmc_tpu.config import default_warmup_stages


def test_mesh_has_8_devices():
    mesh = make_chain_mesh()
    assert mesh.size == 8


def test_sharded_sampling_end_to_end():
    """Full warmup + sampling with chains sharded over 8 devices; posterior
    must match and outputs stay chain-sharded."""
    mesh = make_chain_mesh()
    model = std_normal(6)
    stages = default_warmup_stages(init_steps=30, middle_steps=25,
                                   doubling_stages=2, terminating_steps=20)
    res = sample(jax.random.PRNGKey(0), model, n_draws=300, n_chains=32,
                 mesh=mesh, warmup_stages=stages, dtype=jnp.float64)
    flat = np.asarray(res.draws).reshape(-1, 6)
    np.testing.assert_allclose(flat.mean(0), 0.0, atol=0.1)
    np.testing.assert_allclose(flat.var(0), 1.0, atol=0.2)
    # pooled adaptation => one shared eps scalar, one [D] metric
    assert np.asarray(res.warmup_state.log_eps).ndim == 0
    assert np.asarray(res.warmup_state.metric.inv).shape == (6,)
    # draws sharded over chains axis
    shard_axes = {s.device for s in res.draws.addressable_shards}
    assert len(shard_axes) == 8


def test_gspmd_matches_single_device():
    """The sharded run must produce identical results to the unsharded run
    with the same key (GSPMD is a partitioning, not an algorithm change)."""
    model = std_normal(4)
    stages = default_warmup_stages(init_steps=20, middle_steps=20,
                                   doubling_stages=1, terminating_steps=15)
    key = jax.random.PRNGKey(42)
    res_single = sample(key, model, n_draws=100, n_chains=16,
                        warmup_stages=stages, dtype=jnp.float64)
    mesh = make_chain_mesh()
    res_sharded = sample(key, model, n_draws=100, n_chains=16, mesh=mesh,
                         warmup_stages=stages, dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(res_single.draws),
                               np.asarray(res_sharded.draws), atol=1e-8)
    np.testing.assert_allclose(np.asarray(res_single.warmup_state.log_eps),
                               np.asarray(res_sharded.warmup_state.log_eps),
                               atol=1e-10)


def test_shard_map_rhat_ess_match_local():
    """Explicit psum-based R-hat/ESS must equal the single-device versions."""
    mesh = make_chain_mesh()
    rng = np.random.default_rng(0)
    n, c, d = 200, 32, 3
    phi = 0.7
    draws = np.zeros((n, c, d))
    noise = rng.normal(size=(n, c, d))
    for t in range(1, n):
        draws[t] = phi * draws[t - 1] + noise[t] * np.sqrt(1 - phi**2)
    draws = jnp.asarray(draws)

    want_rhat = np.asarray(diag.split_rhat(draws))
    want_ess = np.asarray(diag.ess_bulk(draws))

    spec = P(None, "chain", None)
    fn = shard_map(
        lambda x: (split_rhat_sharded(x, "chain"), ess_bulk_sharded(x, "chain")),
        mesh=mesh, in_specs=(spec,), out_specs=(P(), P()))
    got_rhat, got_ess = fn(jax.device_put(draws, NamedSharding(mesh, spec)))
    np.testing.assert_allclose(np.asarray(got_rhat), want_rhat, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(got_ess), want_ess, rtol=1e-6)


def test_pooled_acceptance_collective():
    mesh = make_chain_mesh()
    acc = jnp.linspace(0.0, 1.0, 64)
    fn = shard_map(lambda a: pooled_acceptance(a, "chain"), mesh=mesh,
                   in_specs=(P("chain"),), out_specs=P())
    got = float(fn(jax.device_put(acc, NamedSharding(mesh, P("chain")))))
    np.testing.assert_allclose(got, float(jnp.mean(acc)), rtol=1e-12)


def test_shard_by_chain_placement():
    mesh = make_chain_mesh()
    tree = {"q": jnp.zeros((16, 5)), "metric": jnp.ones((5,)), "eps": jnp.asarray(0.5)}
    out = shard_by_chain(tree, mesh, 16)
    assert len({s.device for s in out["q"].addressable_shards}) == 8
    assert out["metric"].sharding.is_fully_replicated
    assert out["eps"].sharding.is_fully_replicated


def test_sharded_thin_and_draw_block():
    """run_sharded has the full single-device driver surface (thin,
    draw_block) — `mcmc.jl:130-159` parity for the mesh path."""
    mesh = make_chain_mesh()
    model = std_normal(4)
    stages = default_warmup_stages(init_steps=20, middle_steps=20,
                                   doubling_stages=1, terminating_steps=20)
    res = sample(jax.random.PRNGKey(1), model, n_draws=60, n_chains=16,
                 mesh=mesh, warmup_stages=stages, thin=2, draw_block=25)
    assert res.draws.shape == (60, 16, 4)
    flat = np.asarray(res.draws).reshape(-1, 4)
    np.testing.assert_allclose(flat.mean(0), 0.0, atol=0.2)
    shard_axes = {s.device for s in res.draws.addressable_shards}
    assert len(shard_axes) == 8


def test_sharded_tree_kernel_via_shard_map():
    """use_pallas='tree' under a mesh: the whole-transition kernel (Pallas
    interpreter on CPU) runs per-device under shard_map; posterior matches."""
    mesh = make_chain_mesh()
    model = std_normal(4)
    stages = default_warmup_stages(init_steps=20, middle_steps=20,
                                   doubling_stages=1, terminating_steps=20)
    res = sample(jax.random.PRNGKey(2), model, n_draws=150, n_chains=16,
                 mesh=mesh, warmup_stages=stages, use_pallas="tree")
    flat = np.asarray(res.draws).reshape(-1, 4)
    np.testing.assert_allclose(flat.mean(0), 0.0, atol=0.15)
    np.testing.assert_allclose(flat.var(0), 1.0, atol=0.35)
    shard_axes = {s.device for s in res.draws.addressable_shards}
    assert len(shard_axes) == 8


def test_sharded_checkpointing(tmp_path):
    """Warmup + sampling checkpoints work under the mesh: a fresh call with
    the same checkpoint files resumes instead of recomputing."""
    mesh = make_chain_mesh()
    model = std_normal(3)
    stages = default_warmup_stages(init_steps=15, middle_steps=15,
                                   doubling_stages=1, terminating_steps=15)
    wck = str(tmp_path / "warm.npz")
    sck = str(tmp_path / "samp.npz")
    res = sample(jax.random.PRNGKey(3), model, n_draws=40, n_chains=16,
                 mesh=mesh, warmup_stages=stages, draw_block=20,
                 warmup_checkpoint_path=wck, sample_checkpoint_path=sck)
    assert res.draws.shape == (40, 16, 3)
    import os
    assert os.path.exists(wck) and os.path.exists(sck)
    # resume: with the sampling checkpoint complete, draws are identical
    res2 = sample(jax.random.PRNGKey(3), model, n_draws=40, n_chains=16,
                  mesh=mesh, warmup_stages=stages, draw_block=20,
                  warmup_checkpoint_path=wck, sample_checkpoint_path=sck)
    np.testing.assert_allclose(np.asarray(res2.draws), np.asarray(res.draws))


def test_chain_dim_mesh_end_to_end():
    """2-D (chain, dim) mesh — SURVEY §2 'within-model sharding (TP analog)':
    position/momentum/gradient buffers split over the dim axis, logp and
    turn-criterion reductions become psums over 'dim' (inserted by GSPMD).
    Posterior must match and state leaves must carry the 2-D sharding."""
    from inplacedhmc_tpu.parallel.mesh import make_chain_dim_mesh
    mesh = make_chain_dim_mesh(4, 2)
    assert mesh.shape["chain"] == 4 and mesh.shape["dim"] == 2
    model = std_normal(6)
    stages = default_warmup_stages(init_steps=20, middle_steps=20,
                                   doubling_stages=1, terminating_steps=20)
    res = sample(jax.random.PRNGKey(5), model, n_draws=200, n_chains=16,
                 mesh=mesh, warmup_stages=stages, dtype=jnp.float64)
    flat = np.asarray(res.draws).reshape(-1, 6)
    np.testing.assert_allclose(flat.mean(0), 0.0, atol=0.15)
    np.testing.assert_allclose(flat.var(0), 1.0, atol=0.3)
    # all 8 devices participate
    assert len({s.device for s in res.draws.addressable_shards}) == 8


def test_chain_dim_mesh_matches_single_device():
    """dim-sharding is a partitioning, not an algorithm change: same key ==
    same draws as the unsharded run."""
    from inplacedhmc_tpu.parallel.mesh import make_chain_dim_mesh
    model = std_normal(4)
    stages = default_warmup_stages(init_steps=15, middle_steps=15,
                                   doubling_stages=1, terminating_steps=15)
    key = jax.random.PRNGKey(7)
    res_single = sample(key, model, n_draws=80, n_chains=8,
                        warmup_stages=stages, dtype=jnp.float64)
    mesh = make_chain_dim_mesh(4, 2)
    res_2d = sample(key, model, n_draws=80, n_chains=8, mesh=mesh,
                    warmup_stages=stages, dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(res_single.draws),
                               np.asarray(res_2d.draws), atol=1e-8)


def test_shard_state_placement_2d():
    from inplacedhmc_tpu.parallel.mesh import make_chain_dim_mesh, shard_state
    from jax.sharding import PartitionSpec as P
    mesh = make_chain_dim_mesh(4, 2)
    tree = {"q": jnp.zeros((16, 6)),            # [C, D] -> P(chain, dim)
            "stack": jnp.zeros((16, 3, 6)),     # [C, md1, D] -> P(chain, None, dim)
            "metric": jnp.ones((6,)),           # [D] -> P(dim)
            "dense": jnp.eye(6),                # [D, D] -> P(dim, None)
            "eps": jnp.asarray(0.5)}            # scalar -> replicated
    out = shard_state(tree, mesh, 16, 6)
    assert out["q"].sharding.spec == P("chain", "dim")
    assert out["stack"].sharding.spec == P("chain", None, "dim")
    assert out["metric"].sharding.spec == P("dim")
    assert out["dense"].sharding.spec == P("dim", None)
    assert out["eps"].sharding.is_fully_replicated


def test_data_chain_mesh_logistic():
    """('data','chain') mesh — SURVEY §2 C13: model data sharded over the
    observation axis (logp/grad contractions psum over 'data' via GSPMD),
    chains over 'chain'.  Must reproduce the unsharded run exactly."""
    from inplacedhmc_tpu.models import logistic_regression, synthetic_data
    from inplacedhmc_tpu.parallel.mesh import (make_data_chain_mesh,
                                               shard_model_data)
    x, y, _ = synthetic_data(jax.random.PRNGKey(0), 512, 5, jnp.float64)
    stages = default_warmup_stages(init_steps=15, middle_steps=15,
                                   doubling_stages=1, terminating_steps=15)
    key = jax.random.PRNGKey(11)
    res_single = sample(key, logistic_regression(x, y), n_draws=60,
                        n_chains=8, warmup_stages=stages, dtype=jnp.float64)

    mesh = make_data_chain_mesh(2, 4)
    xs, ys = shard_model_data(mesh, x, y)
    assert not xs.sharding.is_fully_replicated
    res_mesh = sample(key, logistic_regression(xs, ys), n_draws=60,
                      n_chains=8, mesh=mesh, warmup_stages=stages,
                      dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(res_mesh.draws),
                               np.asarray(res_single.draws), atol=1e-8)
    assert len({s.device for s in res_mesh.draws.addressable_shards}) >= 4


def test_sharded_work_sorted_schedule():
    """schedule='work_sorted' under a mesh: each device argsorts its LOCAL
    chain rows inside the shard_map wrapper (sample._shard_map_transition)
    — no cross-device sort collective — and draws come back in original
    chain coordinates; the posterior matches the unscheduled sharded run."""
    from inplacedhmc_tpu.models import funnel

    mesh = make_chain_mesh()
    model = funnel(4)
    stages = default_warmup_stages(
        local_optimization=None, init_steps=20, middle_steps=20,
        doubling_stages=1, terminating_steps=20)
    kw = dict(n_draws=300, n_chains=32, mesh=mesh, warmup_stages=stages,
              use_pallas="tree", tree_opts={"block_c": 8})
    res = sample(jax.random.PRNGKey(5), model, schedule="work_sorted", **kw)
    base = sample(jax.random.PRNGKey(5), model, **kw)
    d_s = np.asarray(res.draws)
    d_b = np.asarray(base.draws)
    # funnel scale coordinate: mean 0, sd 3
    assert abs(d_s[:, :, 0].mean()) < 1.0
    assert abs(d_s[:, :, 0].mean() - d_b[:, :, 0].mean()) < 1.2
    assert np.isfinite(d_s).all()
    assert len({s.device for s in res.draws.addressable_shards}) == 8


def test_per_shard_sorting_matches_single_device_sorted_utilization():
    """Telemetry for the collective-free per-shard schedule (VERDICT r3
    next #4): sorting chains by work WITHIN each device shard achieves the
    same tiled lockstep utilization as a standalone single device running
    the same number of chains sorted — each shard IS a sorted small-device
    instance, and chains are iid across shards.  (A GLOBAL cross-device sort
    would score higher on aggregate utilization by concentrating the tail
    depths into one tile on one device — but that device then straggles the
    lockstep mesh, so per-shard sorting is also the load-balanced choice,
    not just the collective-free one.)"""
    from inplacedhmc_tpu.core.state import TreeStats

    rng = np.random.default_rng(0)
    n_trans, c, n_shards, block_c = 16, 1024, 8, 32
    c_local = c // n_shards
    # funnel-like position-persistent work: per-chain depth constant over
    # transitions, heavy-tailed across chains
    depth_c = rng.choice(np.arange(1, 9), size=c,
                         p=np.asarray([.30, .25, .18, .12, .07, .04,
                                       .025, .015]))

    def util(depth_by_chain):
        d = np.broadcast_to(depth_by_chain, (n_trans, len(depth_by_chain)))
        s = (1 << d) - 1
        z = np.zeros_like(s)
        st = TreeStats(energy=z, acceptance_rate=z, termination=z,
                       term_left=z, term_right=z, depth=d, steps=s)
        return diag.tiled_lockstep_utilization(st, block_c, max_depth=10)

    u_rand = util(depth_c)
    per_shard = np.concatenate(
        [np.sort(sh_depths) for sh_depths in depth_c.reshape(n_shards, -1)])
    u_shard = util(per_shard)
    # the single-device sorted figure at the same local chain count,
    # averaged over the shards' iid draws
    u_single = np.mean([util(np.sort(sh)) for sh in
                        depth_c.reshape(n_shards, -1)])
    assert u_shard > 1.3 * u_rand           # sorting is a real lever here
    np.testing.assert_allclose(u_shard, u_single, rtol=0.15)


def test_sharded_swept_padded_path():
    """padded_io + n_sweep under a mesh (VERDICT r4 next #4): each device
    carries its own persistent padded state inside the shard_map wrapper
    (sample._shard_map_padded_runner), padding local rows to kernel tiles
    per shard — 16 chains / 8 devices = 2 rows/shard padded to an 8-row
    tile exercises the internal padding.  Posterior matches the
    per-transition sharded run; draws stay chain-sharded."""
    mesh = make_chain_mesh()
    model = std_normal(4)
    stages = default_warmup_stages(init_steps=20, middle_steps=20,
                                   doubling_stages=1, terminating_steps=20)
    kw = dict(n_draws=200, n_chains=16, mesh=mesh, warmup_stages=stages,
              use_pallas="tree")
    res = sample(jax.random.PRNGKey(7), model,
                 tree_opts={"block_c": 8, "padded_io": True, "n_sweep": 2},
                 **kw)
    base = sample(jax.random.PRNGKey(7), model,
                  tree_opts={"block_c": 8}, **kw)
    d = np.asarray(res.draws)
    assert d.shape == (200, 16, 4)
    np.testing.assert_allclose(d.reshape(-1, 4).mean(0), 0.0, atol=0.2)
    np.testing.assert_allclose(d.reshape(-1, 4).var(0), 1.0, atol=0.4)
    db = np.asarray(base.draws).reshape(-1, 4)
    assert abs(d.reshape(-1, 4).var() - db.var()) < 0.4
    assert len({s.device for s in res.draws.addressable_shards}) == 8
    # thin composes with the sweep (thin=2 divides n_sweep=2)
    res_t = sample(jax.random.PRNGKey(8), model, thin=2,
                   tree_opts={"block_c": 8, "padded_io": True, "n_sweep": 2},
                   **kw)
    assert np.asarray(res_t.draws).shape == (200, 16, 4)
    assert np.isfinite(np.asarray(res_t.draws)).all()
