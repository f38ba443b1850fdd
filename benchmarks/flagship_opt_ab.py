"""Flagship transition A/B: in-kernel refresh + padded persistent state.

Attribution (benchmarks/transition_attr.json) split the ~6.6 ms flagship
transition (10,240 chains x 100-D std normal, eps=0.25, depth-4 trees) into
~1.6 ms leaf work + ~1.8 ms out-of-kernel scan-body cost (threefry momentum,
HBM momentum round trip, pad/unpad copies) + per-tile and unrolled-block
overheads.  This harness measures the candidate fixes:

* ``refresh_inside``: momentum (Box-Muller) + direction bits from the
  in-kernel TPU PRNG — kills the threefry dispatch and the [C, D] momentum
  HBM traffic;
* ``padded_io``: the scan carries the ``[cpad, dpad]`` state, paying
  pad/unpad once per block instead of per transition;
* ``block_c``: larger tiles amortize the measured ~25 us/tile overhead.

Statistical validation is built in: the std-normal posterior moments and the
mean acceptance of every arm must match the classic path (the new PRNG
changes the stream, not the distribution).

Run: python benchmarks/flagship_opt_ab.py
Writes benchmarks/flagship_opt_ab.json.
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

N_CHAINS, DIM, N_TRANS = 10_240, 100, 16


def arm_classic(block_c, reps):
    import inplacedhmc_tpu as ih
    from inplacedhmc_tpu.models import std_normal
    from inplacedhmc_tpu.ops.tree_pallas import make_gaussian_tree_transition

    model = std_normal(DIM)
    pot = ih.batched_logdensity_and_grad(model.logp)
    trans = make_gaussian_tree_transition(
        model.structure["precision"], jnp.ones(DIM), max_depth=10,
        block_c=block_c)
    eps = jnp.asarray(0.25, jnp.float32)

    @jax.jit
    def block(key, q):
        z = ih.evaluate(pot, q)

        def step(carry, k):
            z, total, acc = carry
            z2, stats = trans(k, z, eps)
            return (z2, total + jnp.sum(stats.steps.astype(jnp.int64)),
                    acc + jnp.sum(stats.acceptance_rate)), None

        (z, total, acc), _ = jax.lax.scan(
            step, (z, jnp.asarray(0, jnp.int64), jnp.asarray(0.0)),
            jax.random.split(key, N_TRANS))
        return z.q, total, acc

    return _measure(block, reps, lambda q: q)


def arm_padded(block_c, reps, unroll=1):
    from inplacedhmc_tpu.models import std_normal
    from inplacedhmc_tpu.ops.common import chain_tiles, round_up
    from inplacedhmc_tpu.ops.tree_pallas import make_gaussian_tree_transition

    model = std_normal(DIM)
    _, run_padded = make_gaussian_tree_transition(
        model.structure["precision"], jnp.ones(DIM), max_depth=10,
        block_c=block_c, refresh_inside=True, padded_io=True)
    dpad = round_up(DIM, 128)
    cpad, _ = chain_tiles(N_CHAINS, block_c)
    epsc = jnp.full((cpad, 1), 0.25, jnp.float32)
    validc = jnp.ones((cpad, 1), jnp.int32)

    @jax.jit
    def block(key, q):
        q_pad = jnp.zeros((cpad, dpad), jnp.float32) \
            .at[:N_CHAINS, :DIM].set(q)

        def step(carry, k):
            qp, total, acc = carry
            q2, logp, grad, stats = run_padded(k, qp, epsc, validc)
            return (q2, total + jnp.sum(stats.steps.astype(jnp.int64)),
                    acc + jnp.sum(stats.acceptance_rate)), None

        (q_pad, total, acc), _ = jax.lax.scan(
            step, (q_pad, jnp.asarray(0, jnp.int64), jnp.asarray(0.0)),
            jax.random.split(key, N_TRANS), unroll=unroll)
        return q_pad[:N_CHAINS, :DIM], total, acc

    return _measure(block, reps, lambda q: q)


def arm_sweep(block_c, reps, n_sweep):
    """K transitions per kernel launch (n_sweep): the scan body + tile setup
    amortize over the sweep; draws come back stacked [K, cpad, dpad]."""
    from inplacedhmc_tpu.models import std_normal
    from inplacedhmc_tpu.ops.common import chain_tiles, round_up
    from inplacedhmc_tpu.ops.tree_pallas import make_gaussian_tree_transition

    assert N_TRANS % n_sweep == 0
    model = std_normal(DIM)
    _, run_padded = make_gaussian_tree_transition(
        model.structure["precision"], jnp.ones(DIM), max_depth=10,
        block_c=block_c, refresh_inside=True, padded_io=True, n_sweep=n_sweep)
    dpad = round_up(DIM, 128)
    cpad, _ = chain_tiles(N_CHAINS, block_c)
    epsc = jnp.full((cpad, 1), 0.25, jnp.float32)
    validc = jnp.ones((cpad, 1), jnp.int32)

    @jax.jit
    def block(key, q):
        q_pad = jnp.zeros((cpad, dpad), jnp.float32) \
            .at[:N_CHAINS, :DIM].set(q)

        def step(carry, k):
            qp, total, acc = carry
            q_draws, logp, grad, stats = run_padded(k, qp, epsc, validc)
            return (q_draws[-1],
                    total + jnp.sum(stats.steps.astype(jnp.int64)),
                    acc + jnp.sum(stats.acceptance_rate)), None

        (q_pad, total, acc), _ = jax.lax.scan(
            step, (q_pad, jnp.asarray(0, jnp.int64), jnp.asarray(0.0)),
            jax.random.split(key, N_TRANS // n_sweep))
        return q_pad[:N_CHAINS, :DIM], total, acc

    return _measure(block, reps, lambda q: q)


def _measure(block, reps, unpack):
    key = jax.random.PRNGKey(0)
    q0 = jax.random.normal(key, (N_CHAINS, DIM), jnp.float32)
    q1, total, acc = block(jax.random.PRNGKey(1), q0)
    int(total)
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        q2, total, acc = block(jax.random.PRNGKey(2 + r), q1)
        total = int(total)
        float(jnp.sum(q2))
        best = min(best, time.perf_counter() - t0)
    q = np.asarray(unpack(q2))
    return {
        "steps_per_s": round(total / best, 0),
        "wall_per_transition_ms": round(best / N_TRANS * 1e3, 3),
        "steps_per_chain": round(total / (N_TRANS * N_CHAINS), 2),
        "accept_mean": round(float(acc) / (N_TRANS * N_CHAINS), 4),
        "q_mean_abs": round(float(np.abs(q.mean(0)).mean()), 4),
        "q_var_mean": round(float(q.var(0).mean()), 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sweep-only", action="store_true",
                    help="measure only the n_sweep arms")
    ap.add_argument("--bcs", default="512,1024,2048",
                    help="block_c grid for the classic/padded arms")
    ap.add_argument("--sweep-grid", default="512:4,512:16,1024:16,2048:16",
                    help="bc:K grid for the sweep arms.  bc=2048 with "
                         "refresh_inside dies in Mosaic scoped-VMEM "
                         "allocation (measured: the Box-Muller temporaries "
                         "on top of the bc=2048 scratch budget) — drop it "
                         "when measuring on v5e")
    ap.add_argument("--keep", action="store_true",
                    help="append to an existing flagship_opt_ab.json "
                         "instead of starting fresh")
    args = ap.parse_args()

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "flagship_opt_ab.json")
    rows = []
    if args.keep and os.path.exists(out):
        with open(out) as f:
            rows = json.load(f)

    def record(label, bc, fn, *a, **kw):
        # one arm OOM-ing VMEM (e.g. sweep16 at bc=2048: the [K, BC, dpad]
        # per-tile output window alone is 16 MB) must not lose the others
        try:
            r = {"arm": label, "block_c": bc, **fn(bc, *a, **kw)}
        except Exception as e:
            r = {"arm": label, "block_c": bc, "error": repr(e)[:300]}
        rows.append(r)
        print(json.dumps(r), flush=True)
        with open(out, "w") as f:
            json.dump(rows, f, indent=1)

    if not args.sweep_only:
        for bc in [int(b) for b in args.bcs.split(",") if b]:
            record("classic", bc, arm_classic, args.reps)
            record("padded_rng", bc, arm_padded, args.reps)
        # scan-mechanics probe: fully unrolled loop — if per-iteration
        # while-loop overhead is the invariant ~1.5 ms, straight-line code
        # removes it
        for bc, u in [(512, 16)]:
            record(f"padded_rng_unroll{u}", bc, arm_padded, args.reps,
                   unroll=u)
    # the in-kernel sweep: K transitions per launch
    for tok in args.sweep_grid.split(","):
        if not tok:
            continue
        bc, k = (int(v) for v in tok.split(":"))
        record(f"sweep{k}", bc, arm_sweep, args.reps, k)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
