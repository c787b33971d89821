from .reorder import reorder_batch

__all__ = ["reorder_batch"]
