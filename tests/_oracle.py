"""Slow recursive NUTS oracle in pure numpy.

A direct, readable transcription of the reference's *algorithm* (recursive
``adjacent_tree``/``sample_trajectory``, ``/root/reference/src/tree.jl:321-444``
+ the NUTS instantiation in ``NUTS.jl``) used to validate the iterative
lockstep tree in ``inplacedhmc_tpu/nuts/tree.py``.  Everything that is
deterministic given (q0, p0, eps, direction bits) is compared exactly:
termination kind and positions, depth, leapfrog steps, acceptance statistic,
trajectory endpoints, total log weight, and the set of (position, weight)
leaves of the final trajectory.  Only proposal *selection* is random; its
distribution is validated statistically elsewhere.
"""

from __future__ import annotations

import numpy as np


def _logaddexp(a, b):
    return np.logaddexp(a, b)


class Tracer:
    """Carries the Hamiltonian + visited statistics through the recursion."""

    def __init__(self, logp_and_grad, inv_metric, eps, pi0, min_delta):
        self.logp_and_grad = logp_and_grad
        self.inv = np.asarray(inv_metric)
        self.eps = float(eps)
        self.pi0 = float(pi0)
        self.min_delta = float(min_delta)
        self.steps = 0
        self.lsa = -np.inf  # log sum of metropolis acceptance probs

    def psharp(self, p):
        if self.inv.ndim == 1:
            return self.inv * p
        return self.inv @ p

    def joint(self, lp, p):
        k = 0.5 * float(p @ self.psharp(p))
        v = lp - (k if np.isfinite(k) else np.inf)
        return v if np.isfinite(v) else -np.inf

    def leapfrog(self, z, is_fwd):
        q, p, grad, lp = z
        eps = self.eps if is_fwd else -self.eps
        p_mid = p + 0.5 * eps * grad
        q2 = q + eps * self.psharp(p_mid)
        lp2, g2 = self.logp_and_grad(q2)
        if not np.isfinite(lp2):
            lp2, g2 = -np.inf, np.zeros_like(g2)
        g2 = np.where(np.isfinite(g2), g2, 0.0)
        p2 = p_mid + 0.5 * eps * g2
        return (q2, p2, g2, lp2)


def adjacent_tree(tr: Tracer, z, i, depth, is_fwd):
    """Returns ``(node_or_None, invalid_or_None)``; node is a dict."""
    i_prime = i + (1 if is_fwd else -1)
    if depth == 0:
        z2 = tr.leapfrog(z, is_fwd)
        delta = tr.joint(z2[3], z2[1]) - tr.pi0
        if np.isnan(delta):
            delta = -np.inf
        tr.steps += 1
        tr.lsa = _logaddexp(tr.lsa, min(delta, 0.0))
        if delta < tr.min_delta:
            return None, ("divergence", i_prime, i_prime)
        ps = tr.psharp(z2[1])
        return dict(leaves=[(i_prime, delta)], omega=delta, rho=z2[1].copy(),
                    ps_first=ps, ps_last=ps, z_end=z2, i_end=i_prime), None
    t1, invalid = adjacent_tree(tr, z, i, depth - 1, is_fwd)
    if invalid is not None:
        return None, invalid
    t2, invalid = adjacent_tree(tr, t1["z_end"], t1["i_end"], depth - 1, is_fwd)
    if invalid is not None:
        return None, invalid
    rho = t1["rho"] + t2["rho"]
    # generalized U-turn check on the combined node (symmetric in endpoints)
    if (rho @ t1["ps_first"]) < 0 or (rho @ t2["ps_last"]) < 0:
        lo, hi = sorted((i_prime, t2["i_end"]))
        return None, ("turning", lo, hi)
    return dict(leaves=t1["leaves"] + t2["leaves"],
                omega=_logaddexp(t1["omega"], t2["omega"]),
                rho=rho, ps_first=t1["ps_first"], ps_last=t2["ps_last"],
                z_end=t2["z_end"], i_end=t2["i_end"]), None


def oracle_trajectory(logp_and_grad, inv_metric, q0, p0, eps, direction_bits,
                      max_depth=10, min_delta=-1000.0):
    """Build the full trajectory; return every deterministic observable."""
    q0 = np.asarray(q0, float)
    p0 = np.asarray(p0, float)
    lp0, g0 = logp_and_grad(q0)
    tr = Tracer(logp_and_grad, inv_metric, eps, 0.0, min_delta)
    tr.pi0 = tr.joint(lp0, p0)
    z0 = (q0, p0, g0, lp0)
    ps0 = tr.psharp(p0)

    leaves = [(0, 0.0)]
    omega = 0.0
    rho = p0.copy()
    ps_l = ps_r = ps0
    z_l = z_r = z0
    i_l = i_r = 0
    depth = 0
    termination = ("max_depth", 1, 0)

    for d in range(max_depth):
        is_fwd = bool((int(direction_bits) >> d) & 1)
        z_start, i_start = (z_r, i_r) if is_fwd else (z_l, i_l)
        node, invalid = adjacent_tree(tr, z_start, i_start, d, is_fwd)
        if invalid is not None:
            termination = invalid
            break
        leaves = leaves + node["leaves"]
        rho = rho + node["rho"]
        if is_fwd:
            z_r, i_r, ps_r = node["z_end"], node["i_end"], node["ps_last"]
        else:
            z_l, i_l, ps_l = node["z_end"], node["i_end"], node["ps_last"]
        depth = d + 1
        if (rho @ ps_l) < 0 or (rho @ ps_r) < 0:
            termination = ("turning", i_l, i_r)
            break

    return dict(
        termination=termination[0],
        term_left=termination[1],
        term_right=termination[2],
        depth=depth,
        steps=tr.steps,
        log_sum_alpha=tr.lsa,
        omega=omega if not leaves else np.logaddexp.reduce([w for _, w in leaves]),
        leaves=dict(leaves),
        i_left=i_l,
        i_right=i_r,
        pi0=tr.pi0,
        accept=min(1.0, float(np.exp(tr.lsa)) / max(tr.steps, 1)),
    )
