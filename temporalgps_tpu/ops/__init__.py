from . import lgc

__all__ = ["lgc"]
