"""High-level sampling drivers.

TPU rebuild of ``/root/reference/src/mcmc.jl``:

* :func:`mcmc_with_warmup` — warmup + sampling for ``n_chains`` vmapped chains
  (``mcmc.jl:94-128``); one chain is just ``n_chains=1``.
* :func:`threaded_mcmc` — the reference's thread-per-chain driver
  (``mcmc.jl:130-159``): chains adapt **independently** (per-chain step size
  and metric), which on TPU is simply ``pooled=False``.
* :func:`sample` — the TPU-idiomatic entry: pooled cross-chain adaptation
  (shared eps + mass matrix via cross-chain/device reductions), optional
  ``jax.sharding.Mesh`` to shard chains across devices (GSPMD inserts the
  collectives over ICI automatically).

Each warmup stage is a separately jitted block (stage lengths are static);
the Python loop between blocks is the reference's ``_warmup!`` unroller
(``warmup.jl:397-408``).  Compiled stage functions are cached per
(model, config, shapes) so repeated calls don't recompile.
"""

from __future__ import annotations

import functools
import time
from typing import Callable, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .adapt import warmup as W
from .config import (DualAveraging, FindLocalOptimum, InitialStepsizeSearch,
                     NUTS, StepsizeCollapseError, TuningNUTS,
                     default_warmup_stages)
from .core.hamiltonian import batched_logdensity_and_grad
from .core.metric import Metric
from .core.state import TreeStats, WarmupState
from .models.base import Model
from .report import NoProgressReport


class MCMCResult(NamedTuple):
    """Chain output: ``draws`` is ``[n_draws, n_chains, dim]``; ``stats`` are
    per-transition :class:`TreeStats` (``[n_draws, n_chains]`` fields);
    ``warmup_state`` holds the adapted metric/eps (``mcmc.jl:94-106``)."""

    draws: jnp.ndarray
    stats: TreeStats
    warmup_state: WarmupState
    warmup_stats: Optional[TreeStats] = None
    #: streaming split-chain moments over every coordinate (only when the run
    #: requested ``collect_moments``) — feed to
    #: :func:`~inplacedhmc_tpu.diagnostics.split_rhat_from_moments`
    sample_moments: Optional[object] = None
    #: streaming diagnostic sketch over the recorded coordinates (only when
    #: the run requested ``collect_sketch``) — feed ``.rank`` to
    #: :func:`~inplacedhmc_tpu.sketch.rank_rhat_from_sketch` and ``.acov`` to
    #: :func:`~inplacedhmc_tpu.sketch.ess_from_sketch`
    sample_sketch: Optional[object] = None


def value_fence(x):
    """Block until ``x`` is computed by fetching a tiny value.  On the remote
    TPU tunnel a value fetch is the only reliable fence (``block_until_ready``
    is not), and bounding the dispatch queue to one in-flight multi-second
    call keeps the remote worker alive.  Accepts an array, a pytree (fences
    its first leaf), or an ``EvalPoint`` (fences ``logp``) — the single
    definition of the idiom the drivers and benches share."""
    x = getattr(x, "logp", x)
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


_sync_fence = value_fence


def _merge_blocks(blocks, z_cur, mom=None):
    """Concatenate per-block draws/stats into one ``SamplingResult``.  Blocks
    may live on device (no checkpointing) or on host as numpy (checkpointed
    runs keep only host copies so device buffers are freed block by block);
    host blocks are merged with numpy so nothing is re-uploaded."""
    import numpy as np
    cat = (np.concatenate if isinstance(blocks[0].draws, np.ndarray)
           else jnp.concatenate)
    draws = cat([b.draws for b in blocks], axis=0)
    stats = jax.tree_util.tree_map(
        lambda *xs: cat(xs, axis=0) if xs[0].ndim else xs[0],
        *[b.stats for b in blocks])
    return W.SamplingResult(z=z_cur, draws=draws, stats=stats, moments=mom)


#: sanity bounds on the tuned step size, checked at every tuning-window (and
#: chunk) boundary — the reference's in-window assertion, warmup.jl:289-296
EPS_COLLAPSE_MIN = 1e-10
EPS_SANE_MAX = 1e10


def _check_eps_sane(log_eps, where: str, stats: Optional[TreeStats] = None):
    """Driver-side ϵ-collapse guard (``warmup.jl:289-296``): one tiny fetch of
    the per-chain min/max step size; raises :class:`StepsizeCollapseError`
    with the offending window's acceptance/divergence summary."""
    eps = jnp.exp(jnp.atleast_1d(log_eps))
    lo, hi = float(jnp.min(eps)), float(jnp.max(eps))
    import math
    if math.isfinite(lo) and math.isfinite(hi) \
            and lo >= EPS_COLLAPSE_MIN and hi <= EPS_SANE_MAX:
        return
    detail = ""
    if stats is not None:
        from .core.state import Termination
        acc = jnp.asarray(stats.acceptance_rate)
        div = jnp.mean((jnp.asarray(stats.termination)
                        == Termination.DIVERGENCE).astype(jnp.float32))
        detail = (f"; window acceptance mean={float(jnp.mean(acc)):.4g} "
                  f"min={float(jnp.min(acc)):.4g}, "
                  f"divergent fraction={float(div):.4g}")
    raise StepsizeCollapseError(
        f"step size out of sane bounds after {where}: eps in "
        f"[{lo:.3g}, {hi:.3g}] (allowed [{EPS_COLLAPSE_MIN:g}, "
        f"{EPS_SANE_MAX:g}]){detail}. The target geometry is likely "
        f"pathological at the current positions (cf. reference "
        f"warmup.jl:289-296); inspect the window's tree statistics or "
        f"loosen the schedule.")


def _shard_map_transition(trans, mesh, axis_name: str,
                          schedule: Optional[str] = None):
    """Wrap a fused whole-transition function so each device runs it on its
    local chain shard: inputs/outputs are sharded over ``axis_name`` on their
    leading (chains) dim, the PRNG key is replicated and folded with the
    device index so shards draw independent randomness.

    ``schedule="work_sorted"``: each device argsorts its LOCAL chain rows by
    the per-chain leapfrog-work EMA before the transition and inverts after —
    per-shard scheduling needs no cross-device collective (a global argsort
    would be a sort collective per transition), and packing similar-depth
    chains into the same kernel tiles is a within-device property anyway
    (tiles never span shards).  The wrapper then carries the sharded EMA:
    signature ``(key, z, eps, ema) -> (z2, stats, ema2)``, flagged with
    ``schedules_internally`` so :func:`adapt.warmup._scheduled_transition`
    delegates instead of sorting globally."""
    from jax.sharding import PartitionSpec as P

    shard_map = jax.shard_map

    def spec_of(tree):
        return jax.tree_util.tree_map(
            lambda x: P(axis_name, *([None] * (jnp.ndim(x) - 1))), tree)

    stats_spec = TreeStats(*(P(axis_name) for _ in TreeStats._fields))

    if schedule is None:
        def sharded(key, z, eps, *, directions=None, momentum=None):
            assert directions is None and momentum is None, (
                "explicit directions/momentum are test-only hooks; the "
                "sharded path draws them per-device")
            eps = jnp.asarray(eps, z.q.dtype)

            def local(k, z_loc, eps_loc):
                k = jax.random.fold_in(k, jax.lax.axis_index(axis_name))
                return trans(k, z_loc, eps_loc)

            # check_vma=False: pallas_call out_shapes carry no varying-mesh-
            # axes annotation, which the jax>=0.8 vma checker rejects inside
            # shard_map
            return shard_map(local, mesh=mesh,
                             in_specs=(P(), spec_of(z), P()),
                             out_specs=(spec_of(z), stats_spec),
                             check_vma=False)(key, z, eps)

        return sharded

    from .adapt.warmup import _SCHED_DECAY

    def sharded_sched(key, z, eps, ema):
        eps = jnp.asarray(eps, z.q.dtype)
        assert eps.ndim == 0, "per-chain eps not supported under shard_mesh"

        def local(k, z_loc, eps_loc, ema_loc):
            k = jax.random.fold_in(k, jax.lax.axis_index(axis_name))
            perm = jnp.argsort(ema_loc)          # ascending predicted work
            inv = jnp.argsort(perm)
            take = lambda x: jnp.take(x, perm, axis=0)
            z2p, stats_p = trans(k, jax.tree_util.tree_map(take, z_loc),
                                 eps_loc)
            untake = lambda x: jnp.take(x, inv, axis=0)
            z2 = jax.tree_util.tree_map(untake, z2p)
            stats = jax.tree_util.tree_map(untake, stats_p)
            ema2 = _SCHED_DECAY * ema_loc \
                + (1.0 - _SCHED_DECAY) * stats.steps.astype(jnp.float32)
            return z2, stats, ema2

        return shard_map(local, mesh=mesh,
                         in_specs=(P(), spec_of(z), P(), P(axis_name)),
                         out_specs=(spec_of(z), stats_spec, P(axis_name)),
                         check_vma=False)(key, z, eps, ema)

    sharded_sched.schedules_internally = True
    return sharded_sched


def _shard_map_padded_runner(run_padded, mesh, axis_name: str):
    """Shard the whole-tree kernel's persistent padded loop
    (:class:`adapt.warmup.SweepRunner`): each device runs ``run_padded`` on
    its LOCAL chain rows, padding them to kernel tiles *inside* the shard
    (tiles never span shards, mirroring :func:`_shard_map_transition`).  The
    returned runner keeps the ``(key, q_pad, eps_col, valid_col)`` signature
    on GLOBAL arrays whose chain padding quantum is 8 rows (``block_c=8``
    metadata) — the kernel's real ``block_c`` tiling is a per-shard concern
    here, so the driver's global padded state stays exactly chain-sharded."""
    from jax.sharding import PartitionSpec as P

    from .ops.common import chain_tiles

    K = run_padded.n_sweep
    kernel_bc = run_padded.block_c
    # leading sweep axis on draws/stats when the kernel sweeps
    draw_spec = P(axis_name, None) if K == 1 else P(None, axis_name, None)
    stat_spec = P(axis_name) if K == 1 else P(None, axis_name)

    def local(k, q, epsc, validc):
        k = jax.random.fold_in(k, jax.lax.axis_index(axis_name))
        c_loc = q.shape[0]
        cpad_loc, _ = chain_tiles(c_loc, kernel_bc)
        pad = cpad_loc - c_loc
        if pad:
            zrow = lambda x: jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
            q, epsc, validc = zrow(q), zrow(epsc), zrow(validc)
        q_d, logp, grad, stats = run_padded(k, q, epsc, validc)
        cut = lambda x: x[..., :c_loc, :] if x.ndim >= 2 else x[:c_loc]
        stats = jax.tree_util.tree_map(
            (lambda x: x[:c_loc]) if K == 1 else (lambda x: x[:, :c_loc]),
            stats)
        return cut(q_d), cut(logp), grad[:c_loc], stats

    from .core.state import TreeStats
    stats_spec = TreeStats(*(stat_spec for _ in TreeStats._fields))

    def sharded(key, q_pad, eps_col, valid_col):
        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(axis_name, None), P(axis_name, None),
                      P(axis_name, None)),
            out_specs=(draw_spec, draw_spec, P(axis_name, None), stats_spec),
            check_vma=False)(key, q_pad, eps_col, valid_col)

    sharded.block_c = 8       # global padding quantum (per-shard tiles inside)
    sharded.n_sweep = K
    sharded.dim = run_padded.dim
    return sharded


class NUTSKernel:
    """Compiled sampling kernels for one (model, algorithm, adaptation) config.

    Reusable across calls: jitted stage functions are cached on this object,
    so the second ``run`` with the same shapes costs no compilation.

    ``use_pallas``: ``"auto"`` (on TPU backends: the whole-transition tree
    kernel when the model/metric qualify **and** the chain count is at or
    above the measured crossover, the fused potential/leapfrog otherwise),
    ``"on"`` (fused potential/leapfrog, no tree kernel), ``"tree"`` (force
    the tree kernel whenever the metric qualifies), ``"off"``, or
    ``"interpret"`` (Pallas interpreter mode, for CPU testing).  The fused
    paths are algebraically identical to the jnp reference path (A/B-tested
    in tests/test_pallas.py, tests/test_tree_pallas.py).
    """

    #: measured crossover (docs/DESIGN.md §2): the whole-tree kernel wins at
    #: ~10k chains and loses at ~1k; "auto" engages it from here up.
    TREE_MIN_CHAINS = 4096

    def __init__(self, model: Model, algorithm: NUTS = NUTS(),
                 pooled: bool = True, axis_name: Optional[str] = None,
                 use_pallas: str = "auto", shard_mesh=None,
                 shard_axis: str = "chain", fused_opts: Optional[dict] = None,
                 tree_opts: Optional[dict] = None,
                 post_step: Optional[Callable] = None,
                 schedule: Optional[str] = None):
        """``shard_mesh``: a ``jax.sharding.Mesh`` with axis ``shard_axis``;
        when set, fused Pallas transitions are wrapped in ``shard_map`` so
        each device runs the kernel on its local chain shard (Pallas calls do
        not auto-partition under GSPMD — the reference's multi-chain driver
        analog for the fused path, ``mcmc.jl:130-159``)."""
        self.model = model
        self.algorithm = algorithm
        self.pooled = pooled
        self.axis_name = axis_name
        self.shard_mesh = shard_mesh
        self.shard_axis = shard_axis
        self.post_step = post_step
        if schedule not in (None, "work_sorted"):
            raise ValueError(f"unknown schedule {schedule!r} "
                             "(None or 'work_sorted')")
        self.schedule = schedule
        self._jit_cache: dict = {}

        if use_pallas == "auto":
            on_tpu = jax.default_backend() not in ("cpu", "gpu")
            use_pallas = "auto" if on_tpu else "off"
        self.use_pallas = use_pallas
        interp = use_pallas == "interpret"
        st = model.structure

        self.potential = batched_logdensity_and_grad(model.logp)
        self.step_factory = None
        self.transition_factory = None

        # "auto" engages the whole-tree kernel only for models where it
        # measures faster: small-D elementwise targets at high chain counts.
        # Matmul-dominated models (logistic) measured SLOWER in the kernel
        # (benchmarks/logistic_ab_c2048.json: 3.8M vs 6.1M steps/s — the
        # D=50->128 lane padding costs 2.5x MXU work), so they stay on the
        # XLA tree + fused Pallas potential unless forced with "tree".
        auto_kinds = ("diag_gaussian", "dense_gaussian", "tile_logp")
        tree_kinds = auto_kinds + ("logistic",)
        wanted = tree_kinds if use_pallas == "tree" else auto_kinds
        if use_pallas in ("tree", "auto") and st is not None \
                and st.get("kind") in wanted:
            # whole-transition Pallas kernel (ops/tree_pallas.py): the entire
            # NUTS tree runs in VMEM.  f32, diagonal or dense shared metric.
            from .core.metric import DenseMetric, DiagMetric
            from .ops.tree_pallas import (make_dense_gaussian_tree_transition,
                                          make_gaussian_tree_transition,
                                          make_logistic_tree_transition,
                                          make_tree_transition)
            algo = self.algorithm
            kind = st.get("kind")
            dim = model.dim
            force = use_pallas == "tree"
            min_chains = 0 if force else self.TREE_MIN_CHAINS
            # CPU has no Mosaic backend: forced tree mode falls back to the
            # Pallas interpreter there (for mesh-path tests on virtual devices)
            tree_interp = interp or jax.default_backend() == "cpu"
            mesh, axis = self.shard_mesh, self.shard_axis
            # kernel knobs: block_c/ckpt_bf16 for every physics; physics_mode/
            # grad_bf16/block_n reach the logistic builder only — validate up
            # front so a typo'd or inapplicable knob fails here, not after
            # warmup has already started
            _common = {"block_c", "ckpt_bf16", "refresh_inside",
                       "padded_io", "n_sweep"}
            _by_kind = {"logistic": _common | {"physics_mode", "grad_bf16",
                                               "block_n"}}
            allowed = _by_kind.get(st.get("kind"), _common)
            topts = dict(tree_opts or {})
            unknown = set(topts) - allowed
            if unknown:
                raise ValueError(
                    f"tree_opts {sorted(unknown)} not supported for model "
                    f"kind {st.get('kind')!r} (allowed: {sorted(allowed)})")
            # padded/sweep options drive the sampling loop only (tuning
            # adapts eps per transition, which an in-kernel sweep cannot);
            # the factory builds a separate n_sweep=1 kernel for tuning and
            # attaches the sweep runner for run_sampling
            sweep_k = int(topts.pop("n_sweep", 1))
            padded_req = bool(topts.pop("padded_io", sweep_k > 1))
            if sweep_k > 1 and not padded_req:
                raise ValueError("n_sweep > 1 requires padded_io")
            if padded_req and not topts.get("refresh_inside", False) \
                    and not tree_interp:
                # on TPU the padded loop draws all randomness in-kernel
                topts["refresh_inside"] = True

            def tree_factory(metric, n_chains=None):
                diag_ok = (isinstance(metric, DiagMetric)
                           and metric.inv.ndim == 1
                           and metric.inv.dtype == jnp.float32)
                dense_ok = (isinstance(metric, DenseMetric)
                            and metric.inv.ndim == 2
                            and metric.inv.dtype == jnp.float32)
                if not (diag_ok or dense_ok):
                    return None
                if n_chains is not None and n_chains < min_chains:
                    return None

                def build(**extra):
                    kw = dict(topts, **extra)
                    if kind == "diag_gaussian":
                        return make_gaussian_tree_transition(
                            st["precision"], metric, max_depth=algo.max_depth,
                            min_delta=algo.min_delta, interpret=tree_interp,
                            **kw)
                    if kind == "dense_gaussian":
                        return make_dense_gaussian_tree_transition(
                            st["precision"], metric, max_depth=algo.max_depth,
                            min_delta=algo.min_delta, interpret=tree_interp,
                            **kw)
                    if kind == "logistic":
                        return make_logistic_tree_transition(
                            st["x"], st["y"], st["inv_var"], metric,
                            max_depth=algo.max_depth, min_delta=algo.min_delta,
                            interpret=tree_interp, **kw)
                    return make_tree_transition(
                        st["tile_logp"], st["data"], dim, metric,
                        max_depth=algo.max_depth, min_delta=algo.min_delta,
                        interpret=tree_interp, **kw)

                if padded_req:
                    ptrans, run_padded = build(padded_io=True,
                                               n_sweep=sweep_k)
                    # a sweep-shaped transition returns stacked draws; tuning
                    # (per-transition eps adaptation) needs the plain kernel
                    trans = ptrans if sweep_k == 1 else build()
                    if mesh is not None:
                        # per-shard persistent padded state (the same move as
                        # per-shard scheduling): each device pads its local
                        # rows to kernel tiles inside the shard_map
                        run_padded = _shard_map_padded_runner(run_padded,
                                                              mesh, axis)
                        trans = _shard_map_transition(trans, mesh, axis,
                                                      schedule=self.schedule)
                    from .adapt.warmup import SweepRunner
                    sweep_meta = SweepRunner(
                        run_padded=run_padded, n_sweep=sweep_k,
                        block_c=run_padded.block_c)
                    trans._sweep = sweep_meta
                else:
                    trans = build()
                    if mesh is not None:
                        trans = _shard_map_transition(trans, mesh, axis,
                                                      schedule=self.schedule)
                return trans

            self.transition_factory = tree_factory

        if use_pallas in ("on", "auto", "interpret") and st is not None:
            if st.get("kind") == "logistic":
                from .ops.logistic_pallas import make_logistic_potential
                self.potential = make_logistic_potential(
                    st["x"], st["y"], st["inv_var"], interpret=interp,
                    **(fused_opts or {}))
            elif st.get("kind") == "diag_gaussian":
                from .core.metric import DiagMetric
                from .ops.leapfrog_pallas import make_fused_gaussian_leapfrog
                prec = st["precision"]

                def factory(metric):
                    if (isinstance(metric, DiagMetric)
                            and metric.inv.ndim == 1
                            and metric.inv.dtype == jnp.float32):
                        fused = make_fused_gaussian_leapfrog(
                            prec, metric.inv, interpret=interp)
                        return lambda q, p, g, lp, e: fused(q, p, e)
                    return None

                self.step_factory = factory

    # -- jitted stage builders ------------------------------------------------

    def _tuning_fn(self, stage: TuningNUTS):
        key = ("tuning", stage)
        if key not in self._jit_cache:
            f = functools.partial(W.run_tuning, potential=self.potential,
                                  stage=stage, algorithm=self.algorithm,
                                  pooled=self.pooled, axis_name=self.axis_name,
                                  step_factory=self.step_factory,
                                  transition_factory=self.transition_factory,
                                  post_step=self.post_step,
                                  schedule=self.schedule)
            self._jit_cache[key] = jax.jit(
                lambda k, state: f(k, state=state), donate_argnums=(1,))
        return self._jit_cache[key]

    def _tuning_chunk_fn(self, stage: TuningNUTS, n: int):
        # keyed by what the chunk program actually depends on — NOT the whole
        # stage: neither stage.n nor stage.lam_value appears inside a chunk
        # (metric estimation lives in finalize_tuning), so every window of
        # the schedule shares one executable per chunk length.  The default
        # 75+(25..400)+50 schedule then compiles 2-3 chunk programs total
        # instead of 2 per window — and each avoided compile is one fewer
        # chance for the remote compile helper to fall over mid-warmup.
        key = ("tuning_chunk", stage.stepsize_adaptation, stage.metric,
               bool(stage.stream), stage.rank, n)
        if key not in self._jit_cache:
            f = functools.partial(W.run_tuning_chunk, potential=self.potential,
                                  stage=stage, algorithm=self.algorithm, n=n,
                                  pooled=self.pooled, axis_name=self.axis_name,
                                  step_factory=self.step_factory,
                                  transition_factory=self.transition_factory,
                                  post_step=self.post_step,
                                  schedule=self.schedule)
            self._jit_cache[key] = jax.jit(
                lambda k, state, da, mom: f(k, state=state, da=da, mom=mom))
        return self._jit_cache[key]

    def _finalize_tuning_fn(self, stage: TuningNUTS):
        # lam is a RUNTIME argument so windows differing only in n (lam
        # defaults to 5/n) share one finalizer executable (see
        # _tuning_chunk_fn); the da carry's pytree structure differs between
        # adapting and fixed-eps stages, hence stepsize_adaptation in the key
        key = ("finalize_tuning", stage.stepsize_adaptation, stage.metric,
               bool(stage.stream), stage.rank)
        if key not in self._jit_cache:
            f = functools.partial(W.finalize_tuning, stage=stage,
                                  pooled=self.pooled, axis_name=self.axis_name)
            self._jit_cache[key] = jax.jit(
                lambda state, z, da, qs, mom, lam: f(
                    state=state, z=z, da=da, qs=qs, mom=mom, lam=lam))
        jitted = self._jit_cache[key]

        def call(state, z, da, qs, mom, _f=jitted, _stage=stage):
            return _f(state, z, da, qs, mom,
                      jnp.asarray(_stage.lam_value, state.z.q.dtype))

        call._jitted = jitted   # precompile() lowers through this
        call._lam = stage.lam_value
        return call

    def _search_fn(self, stage: InitialStepsizeSearch):
        key = ("search", stage)
        if key not in self._jit_cache:
            f = functools.partial(W.run_stepsize_search, potential=self.potential,
                                  stage=stage, pooled=self.pooled,
                                  axis_name=self.axis_name)
            self._jit_cache[key] = jax.jit(lambda k, state: f(k, state=state))
        return self._jit_cache[key]

    def _sampling_fn(self, n_draws: int, thin: int = 1,
                     keep_dims=None, moments: bool = False,
                     moment_total=None):
        """The draw offset inside the whole run (for split-moment halves) is a
        RUNTIME argument of the compiled function — a block loop calls one
        executable for every block instead of recompiling per offset."""
        key = ("sampling", n_draws, thin, keep_dims, moments, moment_total)
        if key not in self._jit_cache:
            f = functools.partial(W.run_sampling, potential=self.potential,
                                  algorithm=self.algorithm, n_draws=n_draws,
                                  thin=thin, keep_dims=keep_dims,
                                  moment_total=moment_total,
                                  step_factory=self.step_factory,
                                  transition_factory=self.transition_factory,
                                  post_step=self.post_step,
                                  schedule=self.schedule)
            if moments:
                g = jax.jit(lambda k, state, mom, off: f(
                    k, state=state, moments0=mom, moment_offset=off))

                def wrapper(k, state, mom=None, offset=0, _g=g):
                    return _g(k, state,
                              W.init_split_moments(state.z.q)
                              if mom is None else mom,
                              jnp.asarray(offset, jnp.int32))

                wrapper._jitted = g  # precompile() lowers through this
                self._jit_cache[key] = wrapper
            else:
                self._jit_cache[key] = jax.jit(
                    lambda k, state: f(k, state=state))
        return self._jit_cache[key]

    def precompile(self, n_chains: int, stages: Sequence, n_draws: int,
                   dtype=jnp.float32, *,
                   tuning_chunk: Optional[int] = None,
                   draw_block: Optional[int] = None,
                   thin: int = 1,
                   keep_dims: Optional[Sequence] = None,
                   collect_moments: bool = False):
        """Ahead-of-time compile every stage for the given shapes (the TPU
        answer to the reference's ``_precompile_`` stub, ``precompile.jl:1-3``):
        lowers and compiles each jitted stage function so the first real
        ``run`` pays no compile latency.  Compiled executables live in jax's
        compilation cache keyed by these shapes.

        Pass the same ``tuning_chunk``/``draw_block``/``thin``/``keep_dims``/
        ``collect_moments`` the real run will use: chunked tuning windows,
        blockwise sampling and streaming-moment sampling each compile distinct
        executables (different static shapes / carried accumulators), and the
        tunnel-limited long runs those options exist for are exactly the runs
        where first-call compile latency hurts most (VERDICT r2 weak #6)."""
        import inplacedhmc_tpu.adapt.warmup as W

        state = W.init_warmup_state(jax.random.PRNGKey(0), self.potential,
                                    self.model.dim, n_chains, dtype, eps=0.5)
        # the stepsize-search stage runs before an eps exists (log_eps=None),
        # a different pytree structure — compile it with the matching state
        state_no_eps = state._replace(log_eps=None)
        key = jax.random.PRNGKey(0)
        kd = None if keep_dims is None else tuple(int(i) for i in keep_dims)
        compiled = []
        for stage in stages:
            if isinstance(stage, InitialStepsizeSearch):
                compiled.append(
                    self._search_fn(stage).lower(key, state_no_eps).compile())
            elif isinstance(stage, TuningNUTS):
                if tuning_chunk is None or tuning_chunk >= stage.n:
                    compiled.append(
                        self._tuning_fn(stage).lower(key, state).compile())
                else:
                    # chunked windows run up to two distinct chunk lengths
                    # (full chunks + one remainder) plus the finalizer
                    adapting = isinstance(stage.stepsize_adaptation,
                                          DualAveraging)
                    da = (W.da_init(stage.stepsize_adaptation,
                                    jnp.exp(state.log_eps))
                          if adapting else None)
                    mom = W.init_stream_moments(stage, state.z)
                    lengths = {min(tuning_chunk, stage.n)}
                    rem = stage.n % tuning_chunk
                    if rem:
                        lengths.add(rem)
                    for nb in sorted(lengths):
                        compiled.append(
                            self._tuning_chunk_fn(stage, nb)
                            .lower(key, state, da, mom).compile())
                    stream = bool(stage.stream and stage.metric is not None)
                    qs = (None if stream else
                          jnp.zeros((stage.n,) + state.z.q.shape, dtype))
                    fin = self._finalize_tuning_fn(stage)
                    compiled.append(fin._jitted.lower(
                        state, state.z, da, qs, mom,
                        jnp.asarray(fin._lam, dtype)).compile())
        # sampling executables: whole-run or per-block (+ remainder), with the
        # streaming-moment carry when requested
        blocks = {n_draws} if (draw_block is None or draw_block >= n_draws) \
            else ({min(draw_block, n_draws)}
                  | ({n_draws % draw_block} if n_draws % draw_block else set()))
        mt = n_draws if (collect_moments and draw_block is not None
                         and draw_block < n_draws) else None
        for nb in sorted(blocks):
            fn = self._sampling_fn(nb, thin, kd, collect_moments, mt)
            if collect_moments:
                mom0 = W.init_split_moments(state.z.q)
                compiled.append(fn._jitted.lower(
                    key, state, mom0, jnp.asarray(0, jnp.int32)).compile())
            else:
                compiled.append(fn.lower(key, state).compile())
        return len(compiled)

    # -- driver ---------------------------------------------------------------

    def warmup(self, key, state: WarmupState, stages: Sequence, reporter=None,
               tuning_chunk: Optional[int] = None,
               sync_blocks: bool = False,
               chunk_hook: Optional[Callable] = None) -> Tuple[WarmupState, list]:
        """Run the stage sequence (the ``_warmup!`` unroller, ``warmup.jl:397-408``).

        ``tuning_chunk``: split each TuningNUTS window into device calls of at
        most this many transitions, with a reporter tick per chunk — the
        reference's in-window progress (``reporting.jl:90-109``); the
        dual-averaging carry threads across chunks, the metric estimate still
        uses the whole window's draws.

        ``chunk_hook(key, z) -> z``: an extra posterior-invariant kernel
        applied BETWEEN tuning chunks at the dispatch level (requires
        ``tuning_chunk``) — the warmup-side analog of
        ``benchmarks/sv_split_driver.py``'s composition.  Use when the
        fused ``post_step`` program does not compile at scale (the
        10k-chain ASIS wedge, docs/DESIGN.md #12.3) or when hook-every-
        transition is unnecessarily fine: an ASIS hook every
        ``tuning_chunk`` transitions lets slow hyperparameters equilibrate
        DURING the metric windows, so the pooled metric/eps are estimated
        on the posterior, not on the initialization transient."""
        reporter = reporter or NoProgressReport()
        warmup_stats = []
        for stage in stages:
            if stage is None:
                continue
            key, sub = jax.random.split(key)
            if isinstance(stage, FindLocalOptimum):
                reporter.start_stage("find local optimum")
                state = W.run_local_optimum(sub, self.model.logp, self.potential,
                                            stage, state)
                reporter.end_stage()
            elif isinstance(stage, InitialStepsizeSearch):
                reporter.start_stage("initial stepsize search")
                state = self._search_fn(stage)(sub, state)
                _check_eps_sane(state.log_eps, "initial stepsize search")
                eps = float(jnp.exp(jnp.atleast_1d(state.log_eps))[0])
                reporter.end_stage(eps=eps)
            elif isinstance(stage, TuningNUTS):
                desc = f"tuning {stage.n} steps" + (
                    f" + {stage.metric} metric" if stage.metric else "")
                reporter.start_stage(desc, stage.n)
                if state.log_eps is None:
                    raise ValueError(
                        "TuningNUTS stage needs an eps: provide `eps=` in "
                        "initialization or keep InitialStepsizeSearch in the schedule")
                if tuning_chunk is None or tuning_chunk >= stage.n:
                    res = self._tuning_fn(stage)(sub, state)
                    state = res.state
                    if chunk_hook is not None:
                        sub, kh = jax.random.split(sub)
                        state = state._replace(z=chunk_hook(kh, state.z))
                    warmup_stats.append(res.stats)
                else:
                    adapting = isinstance(stage.stepsize_adaptation,
                                          DualAveraging)
                    da = (W.da_init(stage.stepsize_adaptation,
                                    jnp.exp(state.log_eps))
                          if adapting else None)
                    stream = bool(stage.stream and stage.metric is not None)
                    mom = W.init_stream_moments(stage, state.z)
                    z_cur, done, parts = state.z, 0, []
                    while done < stage.n:
                        nb = min(tuning_chunk, stage.n - done)
                        sub, kb = jax.random.split(sub)
                        res = self._tuning_chunk_fn(stage, nb)(
                            kb, state._replace(z=z_cur), da, mom)
                        z_cur, da, mom = res.z, res.da, res.mom
                        if chunk_hook is not None:
                            sub, kh = jax.random.split(sub)
                            z_cur = chunk_hook(kh, z_cur)
                        parts.append(res)
                        done += nb
                        if adapting:
                            # in-window collapse check, once per chunk (the
                            # reference checks every transition, warmup.jl:289)
                            _check_eps_sane(
                                jnp.log(W.da_current_eps(da)),
                                f"tuning chunk {done}/{stage.n}", res.stats)
                        if sync_blocks:
                            _sync_fence(z_cur)
                        reporter.step(done)
                    qs = (None if stream else
                          jnp.concatenate([r.draws for r in parts], axis=0))
                    warmup_stats.append(jax.tree_util.tree_map(
                        lambda *xs: jnp.concatenate(xs, axis=0),
                        *[r.stats for r in parts]))
                    state = self._finalize_tuning_fn(stage)(state, z_cur, da,
                                                            qs, mom)
                _check_eps_sane(state.log_eps, f"tuning window ({stage.n})",
                                warmup_stats[-1] if warmup_stats else None)
                eps = float(jnp.exp(jnp.atleast_1d(state.log_eps))[0])
                reporter.end_stage(eps=eps)
            else:
                raise TypeError(f"unknown warmup stage {stage!r}")
        return state, warmup_stats

    def run(self, key, n_draws: int, n_chains: int = 1, *,
            warmup_stages: Optional[Sequence] = None,
            q: Optional[jnp.ndarray] = None,
            metric: Optional[Metric] = None,
            eps: Optional[float] = None,
            dtype=jnp.float32,
            reporter=None,
            thin: int = 1,
            draw_block: Optional[int] = None,
            tuning_chunk: Optional[int] = None,
            collect_warmup_stats: bool = True,
            state: Optional[WarmupState] = None,
            state_transform=None,
            warmup_checkpoint_path: Optional[str] = None,
            sample_checkpoint_path: Optional[str] = None,
            keep_dims: Optional[Sequence] = None,
            collect_moments: bool = False,
            collect_sketch=None,
            store_draws: bool = True,
            sync_blocks: bool = False,
            checkpoint_throttle_s: float = 0.0) -> MCMCResult:
        """``draw_block``: split sampling into device calls of at most this
        many draws — bounds single-execution wall time (remote runtimes kill
        multi-minute calls) and gives per-block progress reporting.

        ``state``: start from an already-initialized (possibly device-sharded)
        :class:`WarmupState` instead of initializing one here.
        ``state_transform``: applied to the initial state (e.g. device-mesh
        placement) — unlike ``state=``, keeps this run's RNG stream identical
        to an untransformed run.

        ``warmup_checkpoint_path`` / ``sample_checkpoint_path``: checkpoint
        after every warmup stage / sampling block and resume from the file if
        it exists (``sample_checkpoint_path`` requires ``draw_block``).
        Checkpointed runs keep completed blocks on HOST (each block's device
        buffers are freed once persisted), so ``result.draws``/``stats`` come
        back as numpy arrays — transparent to jnp ops, but long [N, C, D]
        results are not re-uploaded to device (deliberately: they can exceed
        device memory on the runs checkpointing is for).

        ``keep_dims``: record only these coordinates in ``result.draws``
        (memory-bounded mode for huge chain-count × dimension products —
        BASELINE config 5's 10k × 1002 shape cannot store full draws).
        ``collect_moments``: accumulate streaming split-chain moments over
        EVERY coordinate during sampling; ``result.sample_moments`` then feeds
        :func:`~inplacedhmc_tpu.diagnostics.split_rhat_from_moments` for full
        R̂ coverage without stored draws.

        ``collect_sketch``: a :class:`~inplacedhmc_tpu.sketch.SketchConfig`;
        accumulates streaming rank-R̂ histograms + lag-window autocovariances
        over the recorded coordinates, blockwise (requires ``draw_block``
        unless sampling fits one call).  With ``store_draws=False`` the block
        draw arrays are dropped after feeding the sketch/moments —
        ``result.draws`` is then ``None`` and sampling memory is independent
        of ``n_draws``.

        ``checkpoint_throttle_s``: skip the per-block sampling checkpoint
        unless this many seconds elapsed since the last save (0 = save every
        block).  A lean checkpoint fetches the full moment accumulators
        (O(C·D)) to host; long runs with small blocks (a ~1 GB state saved
        every few seconds) should throttle — a crash then loses at most the
        throttle window.

        ``sync_blocks``: fetch a cheap value after every warmup chunk /
        sampling block so at most one device call is ever in flight.  JAX
        dispatch is async; on remote-attached runtimes (the TPU tunnel) an
        unbounded dispatch queue of multi-second calls can crash the worker,
        and ``block_until_ready`` is not a reliable fence there — a value
        fetch is.  Costs one tiny [C]-sum transfer per block.
        """
        reporter = reporter or NoProgressReport()
        if warmup_stages is None:
            warmup_stages = default_warmup_stages()
        key, k_init, k_warm, k_sample = jax.random.split(key, 4)
        if state is None:
            state = W.init_warmup_state(k_init, self.potential, self.model.dim,
                                        n_chains, dtype, q=q, metric=metric,
                                        eps=eps)
        if state_transform is not None:
            state = state_transform(state)
        if warmup_checkpoint_path is not None:
            from .utils.checkpoint import warmup_with_checkpoints
            state, warmup_stats = warmup_with_checkpoints(
                self, k_warm, state, warmup_stages, warmup_checkpoint_path,
                reporter, tuning_chunk=tuning_chunk)
        else:
            state, warmup_stats = self.warmup(k_warm, state, warmup_stages,
                                              reporter,
                                              tuning_chunk=tuning_chunk,
                                              sync_blocks=sync_blocks)
        reporter.start_stage(f"sampling {n_draws} draws x {n_chains} chains"
                             + (f" (thin {thin})" if thin > 1 else ""), n_draws)
        if sample_checkpoint_path is not None and draw_block is None:
            raise ValueError("sample_checkpoint_path requires draw_block")
        kd = None if keep_dims is None else tuple(int(i) for i in keep_dims)
        if not store_draws and not (collect_sketch is not None or collect_moments):
            raise ValueError("store_draws=False requires collect_sketch or "
                             "collect_moments (nothing would be recorded)")
        sk = None
        if collect_sketch is not None:
            from .sketch import init_stream_sketch, update_stream_sketch
            q_kept = state.z.q if kd is None else jnp.take(
                state.z.q, jnp.asarray(kd, jnp.int32), axis=-1)
            sk = init_stream_sketch(q_kept, collect_sketch)
            # offset/total stay traced so every block reuses one executable
            self._sketch_update = getattr(
                self, "_sketch_update", jax.jit(update_stream_sketch))

        def _drop_draws(blk):
            # keep the NamedTuple shape for the tree_map concatenate but
            # carry a zero-width slice instead of the block's draw array
            return blk._replace(draws=blk.draws[:, :0])

        if draw_block is None or draw_block >= n_draws:
            args = (k_sample, state)
            out = self._sampling_fn(n_draws, thin, kd, collect_moments)(*args)
            if sk is not None:
                sk = self._sketch_update(sk, out.draws, 0, n_draws)
        elif collect_moments or sk is not None:
            # block path with streaming moments: the moment carry (and its
            # fixed qref) threads across blocks; offsets locate each block's
            # draws in the global first/second half
            from .utils.checkpoint import (append_sampling_block,
                                           load_lean_checkpoint,
                                           save_lean_checkpoint)
            mom = None
            blocks = []
            done = 0
            last_save = -float("inf")
            z_cur = state.z
            if sample_checkpoint_path is not None:
                resumed = load_lean_checkpoint(sample_checkpoint_path)
                if resumed is not None:
                    z_cur, k_sample, done, blocks, mom, sk_r = resumed
                    # accumulators only survive a resume under the same options
                    mom = mom if collect_moments else None
                    sk = sk_r if collect_sketch is not None else None
                    if jax.process_count() > 1:
                        # per-process checkpoints hold local chain rows
                        from .parallel.multiprocess import reglobalize_resume
                        z_cur = reglobalize_resume(z_cur, state.z.q, n_chains)
                        mom = reglobalize_resume(mom, state.z.q, n_chains)
                        sk = reglobalize_resume(sk, state.z.q, n_chains)
                    reporter.step(done)
            while done < n_draws:
                nb = min(draw_block, n_draws - done)
                k_sample, kb = jax.random.split(k_sample)
                blk = self._sampling_fn(nb, thin, kd, collect_moments,
                                        n_draws)(
                    kb, WarmupState(z=z_cur, metric=state.metric,
                                    log_eps=state.log_eps),
                    *((mom, done) if collect_moments else ()))
                z_cur, mom = blk.z, blk.moments
                if sk is not None:
                    if (collect_sketch.tail and sk.tail is None and done > 0
                            and done >= collect_sketch.tail_after * n_draws
                            and done < n_draws):
                        # freeze 5%/95% thresholds from the histogram so far;
                        # indicator autocovs stream over the remaining blocks
                        from .sketch import activate_tail
                        sk = activate_tail(sk, collect_sketch, done)
                    sk = self._sketch_update(sk, blk.draws, done, n_draws)
                blk = blk._replace(moments=None)
                blocks.append(blk if store_draws else _drop_draws(blk))
                done += nb
                if sync_blocks:
                    _sync_fence(z_cur)
                if sample_checkpoint_path is not None:
                    # each block is persisted once (O(block)) and kept as a
                    # host copy (frees its device buffers); the O(C*D)
                    # accumulator state is saved on the throttle cadence
                    blocks[-1] = append_sampling_block(
                        sample_checkpoint_path, done - nb, nb, blocks[-1])
                    if (time.monotonic() - last_save >= checkpoint_throttle_s
                            or done >= n_draws):
                        save_lean_checkpoint(sample_checkpoint_path, z_cur,
                                             k_sample, done, mom, sk)
                        last_save = time.monotonic()
                reporter.step(done)
            out = _merge_blocks(blocks, z_cur, mom)
        else:
            from .utils.checkpoint import (append_sampling_block,
                                           load_sampling_checkpoint,
                                           save_sampling_checkpoint)
            blocks = []
            done = 0
            last_save = -float("inf")
            z_cur = state.z
            if sample_checkpoint_path is not None:
                resumed = load_sampling_checkpoint(sample_checkpoint_path)
                if resumed is not None:
                    z_cur, k_sample, done, blocks = resumed
                    if jax.process_count() > 1:
                        from .parallel.multiprocess import reglobalize_resume
                        z_cur = reglobalize_resume(z_cur, state.z.q, n_chains)
                    reporter.step(done)
            while done < n_draws:
                nb = min(draw_block, n_draws - done)
                k_sample, kb = jax.random.split(k_sample)
                blk = self._sampling_fn(nb, thin, kd)(
                    kb, WarmupState(z=z_cur, metric=state.metric,
                                    log_eps=state.log_eps))
                z_cur = blk.z
                blocks.append(blk)
                done += nb
                if sync_blocks:
                    _sync_fence(z_cur)
                if sample_checkpoint_path is not None:
                    blocks[-1] = append_sampling_block(
                        sample_checkpoint_path, done - nb, nb, blk)
                    if (time.monotonic() - last_save >= checkpoint_throttle_s
                            or done >= n_draws):
                        save_sampling_checkpoint(sample_checkpoint_path,
                                                 z_cur, k_sample, done)
                        last_save = time.monotonic()
                reporter.step(done)
            out = _merge_blocks(blocks, z_cur)
        reporter.end_stage()
        ws = None
        if collect_warmup_stats and warmup_stats:
            ws = jax.tree_util.tree_map(
                lambda *xs: jnp.concatenate(xs, axis=0), *warmup_stats)
        final_state = WarmupState(z=out.z, metric=state.metric, log_eps=state.log_eps)
        return MCMCResult(draws=out.draws if store_draws else None,
                          stats=out.stats,
                          warmup_state=final_state, warmup_stats=ws,
                          sample_moments=out.moments, sample_sketch=sk)


_KERNEL_CACHE: dict = {}


def _kernel(model: Model, algorithm: NUTS, pooled: bool,
            axis_name: Optional[str],
            use_pallas: str = "auto", shard_mesh=None,
            shard_axis: str = "chain",
            fused_opts: Optional[dict] = None,
            tree_opts: Optional[dict] = None,
            post_step: Optional[Callable] = None,
            schedule: Optional[str] = None) -> NUTSKernel:
    key = (model, algorithm, pooled, axis_name, use_pallas, shard_mesh,
           shard_axis, tuple(sorted((fused_opts or {}).items())),
           tuple(sorted((tree_opts or {}).items())), post_step, schedule)
    from .ops.tree_pallas import _cache_get
    return _cache_get(_KERNEL_CACHE, key, lambda: NUTSKernel(
        model, algorithm, pooled, axis_name, use_pallas=use_pallas,
        shard_mesh=shard_mesh, shard_axis=shard_axis, fused_opts=fused_opts,
        tree_opts=tree_opts, post_step=post_step, schedule=schedule))


def mcmc_with_warmup(key, model: Model, n_draws: int, n_chains: int = 1, *,
                     delta: float = 0.8,
                     algorithm: NUTS = NUTS(),
                     warmup_stages: Optional[Sequence] = None,
                     pooled: Optional[bool] = None,
                     q: Optional[jnp.ndarray] = None,
                     metric: Optional[Metric] = None,
                     eps: Optional[float] = None,
                     dtype=jnp.float32,
                     reporter=None,
                     thin: int = 1,
                     draw_block: Optional[int] = None,
                     tuning_chunk: Optional[int] = None,
                     warmup_checkpoint_path: Optional[str] = None,
                     sample_checkpoint_path: Optional[str] = None,
                     keep_dims: Optional[Sequence] = None,
                     collect_moments: bool = False,
                     collect_sketch=None,
                     store_draws: bool = True,
                     sync_blocks: bool = False,
                     checkpoint_throttle_s: float = 0.0,
                     use_pallas: str = "auto",
                     fused_opts: Optional[dict] = None,
                     tree_opts: Optional[dict] = None,
                     post_step: Optional[Callable] = None,
                     schedule: Optional[str] = None) -> MCMCResult:
    """NUTS with the default windowed warmup (``mcmc_with_warmup``,
    ``mcmc.jl:109-128``).  ``delta`` is the dual-averaging target acceptance
    rate (the reference's ``δ`` kwarg, ``mcmc.jl:110-111``).  ``use_pallas``
    selects the fused-kernel policy and ``fused_opts``/``tree_opts`` reach
    the fused-potential / whole-tree kernel knobs (see :class:`NUTSKernel`).
    ``schedule="work_sorted"`` permutes chains by a per-chain leapfrog-work
    EMA before every transition (inverted after, so draws/stats stay in
    original chain coordinates) — packs similar-depth chains into the same
    kernel tiles on targets with position-persistent tree depth (see
    ``adapt.warmup._scheduled_transition``)."""
    if pooled is None:
        pooled = n_chains > 1
    if warmup_stages is None:
        warmup_stages = default_warmup_stages(
            stepsize_adaptation=DualAveraging(delta=delta))
    kern = _kernel(model, algorithm, pooled, None, use_pallas=use_pallas,
                   fused_opts=fused_opts, tree_opts=tree_opts,
                   post_step=post_step, schedule=schedule)
    return kern.run(key, n_draws, n_chains, warmup_stages=warmup_stages,
                    q=q, metric=metric, eps=eps, dtype=dtype, reporter=reporter,
                    thin=thin, draw_block=draw_block,
                    tuning_chunk=tuning_chunk,
                    warmup_checkpoint_path=warmup_checkpoint_path,
                    sample_checkpoint_path=sample_checkpoint_path,
                    keep_dims=keep_dims, collect_moments=collect_moments,
                    collect_sketch=collect_sketch, store_draws=store_draws,
                    sync_blocks=sync_blocks,
                    checkpoint_throttle_s=checkpoint_throttle_s)


def threaded_mcmc(key, model: Model, n_draws: int, n_chains: int, *,
                  delta: float = 0.8, **kw) -> MCMCResult:
    """The reference's thread-per-chain driver (``mcmc.jl:130-159``):
    fully independent per-chain adaptation (``pooled=False``); on TPU the
    "threads" are vmapped lanes."""
    return mcmc_with_warmup(key, model, n_draws, n_chains, delta=delta,
                            pooled=False, **kw)


def sample(key, model: Model, n_draws: int, n_chains: int, *,
           delta: float = 0.8, mesh=None, **kw) -> MCMCResult:
    """TPU-idiomatic entry point: pooled cross-chain adaptation; pass a
    ``jax.sharding.Mesh`` with a ``'chain'`` axis to shard chains across
    devices (see ``parallel.mesh``)."""
    if mesh is not None:
        from .parallel.mesh import run_sharded
        return run_sharded(key, model, n_draws, n_chains, mesh=mesh,
                           delta=delta, **kw)
    return mcmc_with_warmup(key, model, n_draws, n_chains, delta=delta,
                            pooled=True, **kw)
