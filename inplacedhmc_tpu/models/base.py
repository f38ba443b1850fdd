"""Model interface.

TPU-native replacement for the reference's external
``AbstractProbabilityModel{D}`` interface (``QuasiNewtonMethods``: ``dimension``,
``logdensity``, ``∂logdensity!`` — imported at
``/root/reference/src/InplaceDHMC.jl:24`` and called via
``logdensity_and_gradient!`` at ``kinetic_energy.jl:73,89``).  Here a model is
simply a pure ``logp(q: [D]) -> scalar`` plus its dimension; gradients come
from ``jax.grad`` instead of hand-written adjoints.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional


@dataclasses.dataclass(frozen=True)
class Model:
    """A target density on an unconstrained ``R^dim``.

    ``logp`` must be jit-traceable and defined on all of ``R^dim`` (return
    ``-inf``/NaN outside the support; the sampler maps non-finite values to
    divergences).  ``constrain`` optionally maps an unconstrained draw to the
    interpretable parameterization for reporting.

    Identity matters for caching: compiled-kernel caches key on the Model
    (and two Models with textually identical but distinct ``logp`` closures
    compare unequal — closure equality is undecidable), so long-lived
    drivers should construct each model ONCE and reuse it.  The zoo's
    hashable-argument factories (``std_normal``, ``funnel``, ``funnel_nc``,
    ``eight_schools``) are memoized for exactly this reason; data-carrying
    factories (``logistic_regression``, ``stoch_vol``) cannot be — hold on
    to their return value.
    """

    name: str
    dim: int
    logp: Callable
    constrain: Optional[Callable] = None

    # Optional structured-gradient metadata consumed by the fused Pallas
    # leapfrog kernel (ops/leapfrog_pallas.py). ``None`` means "use autodiff".
    structure: Optional[dict] = dataclasses.field(default=None, hash=False, compare=False)

    def __hash__(self):
        return hash((self.name, self.dim, id(self.logp)))
