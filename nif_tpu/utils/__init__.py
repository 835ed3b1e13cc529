from .policy import Policy, get_policy
from .precision import high_precision

__all__ = ["Policy", "get_policy", "high_precision"]
