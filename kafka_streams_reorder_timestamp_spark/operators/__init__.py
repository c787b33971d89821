from . import relational  # noqa: F401  (imports run @register decorators)
from .reorder import reorder_batch

__all__ = ["reorder_batch", "relational", "registry"]
