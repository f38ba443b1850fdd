"""Model zoo: the reference's capability surface plus the BASELINE configs."""

from .base import Model
from .eight_schools import eight_schools
from .funnel import funnel, funnel_nc
from .gaussian import diag_normal, mvn, std_normal
from .logistic import logistic_regression, synthetic_data
from .stoch_vol import stoch_vol, synthetic_returns
from .transforms import (Bijector, identity, interval, lower_bounded, positive,
                         simplex, transformed_model)

__all__ = [
    "Model", "std_normal", "diag_normal", "mvn", "funnel", "funnel_nc",
    "logistic_regression", "synthetic_data", "eight_schools",
    "stoch_vol", "synthetic_returns",
    "Bijector", "identity", "interval", "lower_bounded", "positive",
    "simplex", "transformed_model",
]
