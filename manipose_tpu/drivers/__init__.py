from . import common, h36m

__all__ = ["common", "h36m"]
