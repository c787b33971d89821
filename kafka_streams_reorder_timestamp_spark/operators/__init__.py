from . import events_queries, relational  # noqa: F401  (@register decorators)
from .reorder import reorder_batch

__all__ = ["events_queries", "reorder_batch", "relational", "registry"]
