from . import (  # noqa: F401  (imports run @register decorators)
    breadth,
    dedup,
    events_queries,
    multimodal,
    relational,
    similarity,
    text,
)
from .reorder import reorder_batch

__all__ = [
    "breadth",
    "dedup",
    "events_queries",
    "multimodal",
    "reorder_batch",
    "relational",
    "registry",
    "similarity",
    "text",
]
