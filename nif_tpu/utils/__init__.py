from .policy import Policy, get_policy

__all__ = ["Policy", "get_policy"]
