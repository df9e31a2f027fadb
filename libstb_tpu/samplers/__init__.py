from . import ars, hyper, slice

__all__ = ["ars", "hyper", "slice"]
