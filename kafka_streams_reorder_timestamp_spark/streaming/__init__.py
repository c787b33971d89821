from .reorder import reorder_stream

__all__ = ["reorder_stream"]
