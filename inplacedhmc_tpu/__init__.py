"""inplacedhmc_tpu — a TPU-native dynamic-HMC (NUTS) inference engine.

Brand-new JAX/XLA/Pallas implementation with the capabilities of the reference
``chriselrod/InplaceDHMC.jl`` (see SURVEY.md): multinomial NUTS with
generalized U-turn termination, velocity-Verlet leapfrog over diagonal/dense
Gaussian kinetic energies, initial-stepsize search + dual averaging, the
windowed warmup schedule with regularized mass-matrix estimation, an L-BFGS
typical-set initializer, and tree-statistics/EBFMI/R-hat/ESS diagnostics —
vmapped over chains on chip and sharded over device meshes across chips.

Public API (the reference exports at ``InplaceDHMC.jl:3-11`` mapped here):
``mcmc_with_warmup``/``sample`` (drivers), ``NUTS``, ``DualAveraging``,
``TuningNUTS``, ``default_warmup_stages``, metric constructors, and the
``diagnostics`` module.
"""

import os as _os

import jax as _jax

# float32 means float32: jax's DEFAULT matmul precision on TPU is a single
# bf16 MXU pass (8-bit mantissas).  For a sampler, matmul error inside a
# log-density or a kinetic energy is not a performance knob — a deterministic
# perturbation of logp/energy warps the stationary distribution itself
# (measured: O(1) ABSOLUTE logp error at the logistic benchmark shape,
# benchmarks/logistic_precision_ab.json — an e^{±err} density warp the
# CPU interpret-mode tests cannot see).  So the package default is full f32.
# Matmuls that are statistically tolerant of bf16 (covariance / gram
# PRECONDITIONER moments, gradient-only contractions) opt back into fast
# bf16 locally with an explicit ``precision=`` at the call site.
# Precedence: INPLACEDHMC_TPU_MATMUL_PRECISION (package override, any jax
# precision name) > a precision the user already set (jax.config.update or
# JAX's own JAX_DEFAULT_MATMUL_PRECISION env var — never clobbered) > the
# package's "float32" default when nothing is set.
_pkg_prec = _os.environ.get("INPLACEDHMC_TPU_MATMUL_PRECISION")
if _pkg_prec is not None:
    _jax.config.update("jax_default_matmul_precision", _pkg_prec)
elif _jax.config.jax_default_matmul_precision is None:
    _jax.config.update("jax_default_matmul_precision", "float32")

from .config import (DualAveraging, FindLocalOptimum, FixedStepsize,
                     InitialStepsizeSearch, NUTS, TuningNUTS,
                     default_warmup_stages, fixed_stepsize_warmup_stages)
from .core.hamiltonian import batched_logdensity_and_grad, evaluate, joint_logdensity
from .core.metric import (DenseMetric, DiagMetric, dense_metric, diag_metric,
                          estimate_dense_metric, estimate_diag_metric,
                          identity_metric)
from .core.state import EvalPoint, PhasePoint, Termination, TreeStats, WarmupState
from .models import Model
from .nuts.tree import nuts_transition

__version__ = "0.1.0"

__all__ = [
    "NUTS", "DualAveraging", "FixedStepsize", "InitialStepsizeSearch",
    "TuningNUTS", "FindLocalOptimum", "default_warmup_stages",
    "fixed_stepsize_warmup_stages",
    "DiagMetric", "DenseMetric", "diag_metric", "dense_metric",
    "identity_metric", "estimate_diag_metric", "estimate_dense_metric",
    "EvalPoint", "PhasePoint", "Termination", "TreeStats", "WarmupState",
    "batched_logdensity_and_grad", "evaluate", "joint_logdensity",
    "nuts_transition", "Model",
    "__version__",
]

# High-level drivers are imported lazily to keep `import inplacedhmc_tpu`
# cheap; `from inplacedhmc_tpu import sample` works via __getattr__.
_LAZY = {"sample", "mcmc_with_warmup", "threaded_mcmc"}


def __getattr__(name):
    import importlib

    if name in _LAZY:
        mod = importlib.import_module(".sample", __name__)
        return getattr(mod, name)
    if name in ("diagnostics", "sample", "parallel", "models", "report",
                "sketch"):
        return importlib.import_module("." + name, __name__)
    raise AttributeError(f"module 'inplacedhmc_tpu' has no attribute {name!r}")
