"""Neal's funnel — BASELINE config 2.

Exercises step-size adaptation and divergence handling: the neck of the funnel
forces small step sizes and produces divergent transitions, which the sampler
must report (not crash on) via the ``-inf`` sentinel semantics
(``/root/reference/src/kinetic_energy.jl:80-84,107-112``).

``q = (v, x_1..x_{dim-1})`` with ``v ~ N(0, 3^2)`` and ``x_i | v ~ N(0, e^v)``.
"""

from __future__ import annotations

import functools as _functools

import jax.numpy as jnp

from .base import Model


def _make_tile_logp(k: int, scale: float):
    """Whole-tile log density for the Pallas whole-tree kernel
    (ops/tree_pallas.py): layout ``[v, x_1..x_{dim-1}]``; exp(-v) divergences
    are contained by the kernel's leaf sanitization."""
    inv_s2 = 1.0 / (scale * scale)
    kf = float(k)

    def tile_logp(q, refs):
        xm = refs["x_mask"][0:1, :]      # 1 on the x lanes (1 .. dim-1)
        v = q[:, 0:1]
        sumsq = jnp.sum(xm * q * q, axis=1, keepdims=True)
        return -0.5 * (inv_s2 * v * v + sumsq * jnp.exp(-v) + kf * v)

    return tile_logp


_TILE_CACHE: dict = {}


@_functools.lru_cache(maxsize=None)
def funnel(dim: int = 10, scale: float = 3.0) -> Model:
    k = dim - 1

    def logp(q):
        v = q[0]
        x = q[1:]
        lp_v = -0.5 * (v / scale) ** 2
        lp_x = -0.5 * (jnp.sum(x * x) * jnp.exp(-v) + k * v)
        return lp_v + lp_x

    import numpy as _np
    xm = _np.zeros((1, dim), _np.float32)
    xm[0, 1:] = 1.0
    ckey = (k, float(scale))
    if ckey not in _TILE_CACHE:
        _TILE_CACHE[ckey] = _make_tile_logp(k, scale)
    return Model(name=f"funnel_{dim}", dim=dim, logp=logp,
                 structure={"kind": "tile_logp",
                            "tile_logp": _TILE_CACHE[ckey],
                            "data": {"x_mask": xm}})


@_functools.lru_cache(maxsize=None)
def funnel_nc(dim: int = 10, scale: float = 3.0) -> Model:
    """Non-centered Neal's funnel: ``z ~ N(0, I)`` with
    ``v = scale * z_0``, ``x_i = exp(v/2) * z_i`` — the standard
    reparameterization that removes the neck entirely (the unconstrained
    target is an iid standard normal, so NUTS mixes at R-hat < 1.01 where
    the centered form's neck bias is irreducible; see the calibration in
    ``tests/test_golden.py::test_funnel_matches_analytic_golden``).
    ``constrain`` maps draws back to the funnel coordinates ``(v, x)``,
    whose moments match the centered model's exactly."""

    def logp(q):
        return -0.5 * jnp.sum(q * q)

    def constrain(q):
        v = scale * q[..., 0]
        x = jnp.exp(0.5 * v)[..., None] * q[..., 1:]
        return {"v": v, "x": x}

    return Model(name=f"funnel_nc_{dim}", dim=dim, logp=logp,
                 constrain=constrain,
                 structure={"kind": "diag_gaussian",
                            "precision": jnp.ones((dim,))})
