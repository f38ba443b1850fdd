"""Stochastic volatility — BASELINE config 5 (1k latent states, 10k sharded chains).

AR(1) latent log-volatility:

    h_1 ~ N(0, s^2 / (1 - phi^2)),   h_t = phi h_{t-1} + s eps_t
    r_t | h_t ~ N(0, exp(h_t))

Parameters ``q = (arctanh_phi, log_s, h_1..h_T)`` — **centered** latents:
with one observation per latent the likelihood identifies each ``h_t``
directly, so centering beats the whitened/non-centered form (measured: the
scale-whitened variant reached R-hat 5.4 / 19% divergences at T=1000 vs the
centered form's far better geometry; this is the textbook informative-data
regime where centered parameterizations win).  The AR(1) prior is expressed
with vectorized shifts, not a scan, so the gradient stays one fused
elementwise pass — the large-D config that stresses HBM bandwidth in the
leapfrog.  High ``delta`` (0.9+) recommended.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import Model


def synthetic_returns(key, n_steps: int = 1000, phi: float = 0.98,
                      s: float = 0.15, dtype=jnp.float32):
    """Draw ``r_1..r_T`` from the documented model: stationary init
    ``h_1 ~ N(0, s^2/(1-phi^2))`` (``eps[0]`` has sd ``s``, so dividing by
    ``sqrt(1-phi^2)`` gives exactly the stationary sd), innovations
    ``h_t = phi h_{t-1} + s eps_t`` for ``t >= 2``."""
    kh, kr = jax.random.split(key)
    eps = jax.random.normal(kh, (n_steps,), dtype) * s

    def step(h, e):
        h2 = phi * h + e
        return h2, h2

    h1 = eps[0] / jnp.sqrt(1.0 - phi * phi)
    _, rest = jax.lax.scan(step, h1, eps[1:])
    h = jnp.concatenate([h1[None], rest])
    r = jax.random.normal(kr, (n_steps,), dtype) * jnp.exp(0.5 * h)
    return r


def _theta_prior(raw_phi, log_s):
    """Hyperparameter priors: raw_phi ~ N(1.5, 1), log_s ~ N(-2, 1) — the
    single definition shared by the centered density, the tile physics and
    the ASIS ancillary density (three hand-synced copies invite silent
    divergence)."""
    return -0.5 * (raw_phi - 1.5) ** 2 - 0.5 * (log_s + 2.0) ** 2


def _obs_term(h, r2):
    """Per-latent observation log density (up to constants):
    ``r_t | h_t ~ N(0, exp(h_t))``."""
    return -0.5 * (h + r2 * jnp.exp(-h))


def _make_tile_logp(t: int):
    """Whole-tile log density for the Pallas whole-tree kernel
    (ops/tree_pallas.py): layout ``[raw_phi, log_s, h_1..h_T]`` with the
    squared returns aligned to the h lanes.  The AR(1) innovation term uses a
    one-lane ``jnp.roll`` (h_{t-1} under h_t) — in-kernel autodiff
    differentiates through it.  Numerically identical to ``stoch_vol.logp``
    (A/B-tested in tests/test_stoch_vol.py)."""
    tf = float(t)

    def tile_logp(q, refs):
        r2 = refs["r2"][0:1, :]          # r_t^2 at lane t+1 (h_t's lane)
        hm = refs["h_mask"][0:1, :]      # 1 on h lanes (2 .. T+1)
        am = refs["ar_mask"][0:1, :]     # 1 on lanes with a predecessor (3 .. T+1)
        raw_phi = q[:, 0:1]
        log_s = q[:, 1:2]
        phi = jnp.tanh(raw_phi)
        inv_s = jnp.exp(-log_s)
        lp = _theta_prior(raw_phi, log_s)
        one_m_phi2 = 1.0 - phi * phi
        lp += 0.5 * jnp.log(one_m_phi2) - tf * log_s
        h0 = q[:, 2:3]
        lp += -0.5 * one_m_phi2 * (h0 * inv_s) ** 2
        h = q * hm
        hprev = jnp.roll(h, 1, axis=1)   # lane l now holds h at lane l-1
        innov = (q - phi * hprev) * am * inv_s
        lp += -0.5 * jnp.sum(innov * innov, axis=1, keepdims=True)
        lp += jnp.sum(hm * _obs_term(h, r2), axis=1, keepdims=True)
        return lp

    return tile_logp


_TILE_CACHE: dict = {}


def _tile_structure(returns):
    import numpy as _np
    t = int(returns.shape[0])
    dim = 2 + t
    r2 = _np.zeros((1, dim), _np.float32)
    hm = _np.zeros((1, dim), _np.float32)
    am = _np.zeros((1, dim), _np.float32)
    r2[0, 2:] = _np.asarray(returns, _np.float64) ** 2
    hm[0, 2:] = 1.0
    am[0, 3:] = 1.0
    if t not in _TILE_CACHE:  # shared fn so kernel builds cache across models
        _TILE_CACHE[t] = _make_tile_logp(t)
    return {"kind": "tile_logp", "tile_logp": _TILE_CACHE[t],
            "data": {"r2": r2, "h_mask": hm, "ar_mask": am}}


def _centered_logp(returns):
    """The centered log density ``q = (arctanh phi, log s, h_1..h_T)`` as a
    standalone closure (the ASIS hook needs only this, not a full ``Model``
    with its tile-structure arrays)."""
    returns = jnp.asarray(returns)
    t = returns.shape[0]

    def logp(q):
        raw_phi, log_s, h = q[0], q[1], q[2:]
        phi = jnp.tanh(raw_phi)              # phi in (-1, 1)
        s = jnp.exp(log_s)
        r = jnp.asarray(returns, q.dtype)
        lp = _theta_prior(raw_phi, log_s)
        # AR(1) prior on h with innovation sd s, stationary init
        one_m_phi2 = 1.0 - phi * phi
        lp += 0.5 * jnp.log(one_m_phi2) - jnp.asarray(t, q.dtype) * log_s
        lp += -0.5 * one_m_phi2 * (h[0] / s) ** 2
        innov = (h[1:] - phi * h[:-1]) / s
        lp += -0.5 * jnp.sum(innov * innov)
        lp += jnp.sum(_obs_term(h, r * r))
        return lp

    return logp


def stoch_vol(returns) -> Model:
    returns = jnp.asarray(returns)
    t = returns.shape[0]
    dim = 2 + t

    def constrain(q):
        raw_phi, log_s, h = q[..., 0], q[..., 1], q[..., 2:]
        return {"phi": jnp.tanh(raw_phi), "s": jnp.exp(log_s), "h": h}

    return Model(name=f"stoch_vol_{t}", dim=dim, logp=_centered_logp(returns),
                 constrain=constrain, structure=_tile_structure(returns))


def _whiten(raw_phi, log_s, h):
    """Centered latents -> AR(1) innovations: ``eps_1 = h_1 sqrt(1-phi^2)/s``,
    ``eps_t = (h_t - phi h_{t-1})/s``.  Batched: leading axes broadcast.
    ``1 - phi^2`` is floored with the SAME constant as :func:`_reconstruct`,
    so the whiten->reconstruct roundtrip stays exact even where f32 ``tanh``
    saturates to 1 (an unfloored whiten would collapse ``eps_1`` to 0 there
    and an accepted ASIS move would silently teleport ``h_1``)."""
    phi = jnp.tanh(raw_phi)[..., None]
    inv_s = jnp.exp(-log_s)[..., None]
    one_m_phi2 = jnp.maximum(1.0 - phi * phi, 1e-12)
    e1 = h[..., :1] * jnp.sqrt(one_m_phi2) * inv_s
    rest = (h[..., 1:] - phi * h[..., :-1]) * inv_s
    return jnp.concatenate([e1, rest], axis=-1)


def _reconstruct(raw_phi, log_s, eps):
    """Innovations -> centered latents via the linear recurrence
    ``h_t = phi h_{t-1} + s eps_t`` as an O(log T) ``associative_scan``
    (affine-map composition) — TPU-friendly, differentiable.  ``1 - phi^2``
    is floored: f32 ``tanh`` saturates to exactly 1 around ``|raw_phi| > 9``
    and the resulting 0/0 would seed NaN latents."""
    phi = jnp.tanh(raw_phi)[..., None]
    s = jnp.exp(log_s)[..., None]
    b = s * eps
    one_m_phi2 = jnp.maximum(1.0 - phi[..., 0] * phi[..., 0], 1e-12)
    b = b.at[..., 0].set(b[..., 0] / jnp.sqrt(one_m_phi2))
    a = jnp.broadcast_to(phi, eps.shape)
    a = a.at[..., 0].set(0.0)

    def combine(l, r):
        return (r[0] * l[0], r[0] * l[1] + r[1])

    _, h = jax.lax.associative_scan(combine, (a, b), axis=-1)
    return h


def _make_anc_logp(returns):
    """Ancillary MH target: ``[C, 2], [C, T] -> [C]``, prior(theta) +
    observation terms of the reconstructed latents.  The full posterior in
    ``(theta, eps)`` coordinates is this plus the theta-independent
    ``-0.5||eps||^2`` (the Jacobian ``s^T/sqrt(1-phi^2)`` cancels the AR
    normalization exactly — identity A/B-tested in tests/test_stoch_vol.py),
    so that term drops from MH ratios."""
    import numpy as _np
    r2_const = _np.asarray(returns, _np.float64) ** 2

    def anc_logp(theta, eps):
        raw_phi, log_s = theta[..., 0], theta[..., 1]
        h = _reconstruct(raw_phi, log_s, eps)
        r2 = jnp.asarray(r2_const, h.dtype)
        lp = _theta_prior(raw_phi, log_s)
        return lp + jnp.sum(_obs_term(h, r2), axis=-1)

    return anc_logp


def make_asis_hook(returns, *, scale=(0.06, 0.1), n_steps: int = 3,
                   potential=None, per_coord: bool = False):
    """ASIS interleaving for the SV hyperparameters (Yu & Meng 2011): after
    each centered NUTS transition, re-express the latents as AR(1)
    innovations ``eps`` (the *ancillary* parameterization), run ``n_steps``
    random-walk Metropolis updates of ``theta = (arctanh phi, log s)`` with
    ``eps`` held fixed, and map back.  In ancillary coordinates the AR prior
    collapses to a theta-independent ``-0.5||eps||^2`` (the Jacobian
    ``s^T / sqrt(1-phi^2)`` cancels the AR normalization exactly), so the MH
    target is ``prior(theta) + sum_t obs(h_t(theta, eps))`` — each evaluation
    is one O(C T log T) reconstruction.  Both kernels leave the posterior
    invariant; the composition decorrelates the hyperparameters that the
    centered sampler moves slowly (docs/ROADMAP.md round-2 item 4).

    Use via ``mcmc_with_warmup(..., post_step=make_asis_hook(returns))``.
    ``scale``: RW step sds for (arctanh phi, log s).  ``potential``: the
    batched value+grad used to refresh the returned state (defaults to the
    model's autodiff potential).

    ``per_coord``: propose/accept each hyperparameter SEPARATELY (2 MH
    sub-steps per ASIS step) instead of jointly.  At T=1000 the ancillary
    conditional of ``log s`` is ~50x tighter (sd ~ 1/sqrt(2T)) than
    ``arctanh phi``'s, so a joint proposal lets the tight coordinate veto
    the free one — measured at 10,240 chains: joint ASIS reached
    tau_phi ~ 26 but tau_logs ~ 1090 (worse than no ASIS at 238,
    examples/results_round3.jsonl); per-coordinate updates decouple the
    acceptance rates.
    """
    from ..core.hamiltonian import batched_logdensity_and_grad
    from ..core.state import EvalPoint

    returns = jnp.asarray(returns)
    pot = potential if potential is not None else \
        batched_logdensity_and_grad(_centered_logp(returns))
    anc_logp = _make_anc_logp(returns)
    sc = jnp.asarray(scale)

    def hook(key, z):
        q = z.q
        dtype = q.dtype
        theta = q[..., :2]
        h = q[..., 2:]
        eps = _whiten(theta[..., 0], theta[..., 1], h)
        lp = anc_logp(theta, eps)

        def mh(carry, k):
            theta, lp, moved = carry
            if per_coord:
                # one MH sub-step per hyperparameter: the tight coordinate
                # cannot veto the free one
                for j, kj in enumerate(jax.random.split(k, theta.shape[-1])):
                    kp, ku = jax.random.split(kj)
                    step = sc[j].astype(dtype) * \
                        jax.random.normal(kp, lp.shape, dtype)
                    prop = theta.at[..., j].add(step)
                    lp_p = anc_logp(prop, eps)
                    accept = jnp.log(jax.random.uniform(ku, lp.shape, dtype)) \
                        < (lp_p - lp)
                    theta = jnp.where(accept[..., None], prop, theta)
                    lp = jnp.where(accept, lp_p, lp)
                    moved = moved | accept
            else:
                kp, ku = jax.random.split(k)
                prop = theta + sc.astype(dtype) * \
                    jax.random.normal(kp, theta.shape, dtype)
                lp_p = anc_logp(prop, eps)
                accept = jnp.log(jax.random.uniform(ku, lp.shape, dtype)) \
                    < (lp_p - lp)
                theta = jnp.where(accept[..., None], prop, theta)
                lp = jnp.where(accept, lp_p, lp)
                moved = moved | accept
            return (theta, lp, moved), None

        moved0 = jnp.zeros(lp.shape, bool)
        (theta, _, moved), _ = jax.lax.scan(mh, (theta, lp, moved0),
                                            jax.random.split(key, n_steps))
        # chains whose every proposal was rejected keep their EXACT state:
        # the whiten->reconstruct roundtrip would otherwise perturb h by f32
        # rounding every transition (and a non-finite ancillary density —
        # e.g. saturated tanh — must not leak NaN latents into the chain)
        h_new = _reconstruct(theta[..., 0], theta[..., 1], eps)
        q_new = jnp.concatenate([theta, h_new], axis=-1)
        q_new = jnp.where(moved[..., None], q_new, q)
        logp_new, grad_new = pot(q_new)
        logp_new = jnp.where(moved, logp_new, z.logp)
        grad_new = jnp.where(moved[..., None], grad_new, z.grad)
        return EvalPoint(q=q_new, logp=logp_new, grad=grad_new)

    return hook
