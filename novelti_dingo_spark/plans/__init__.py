from .explain import explain_formatted

__all__ = ["explain_formatted"]
