from . import (  # noqa: F401  (imports run @register decorators)
    asof,
    breadth,
    dedup,
    events_queries,
    multimodal,
    relational,
    simhash,
    similarity,
    text,
)
from .reorder import reorder_batch

__all__ = [
    "asof",
    "breadth",
    "dedup",
    "events_queries",
    "multimodal",
    "reorder_batch",
    "relational",
    "registry",
    "simhash",
    "similarity",
    "text",
]
