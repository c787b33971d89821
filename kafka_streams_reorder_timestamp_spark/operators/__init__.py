from . import (  # noqa: F401  (imports run @register decorators)
    asof,
    breadth,
    dedup,
    events_queries,
    graph,
    multimodal,
    pipeline,
    relational,
    sampling,
    simhash,
    similarity,
    subqueries,
    text,
)
from .reorder import reorder_batch

__all__ = [
    "asof",
    "breadth",
    "dedup",
    "events_queries",
    "graph",
    "multimodal",
    "pipeline",
    "reorder_batch",
    "relational",
    "registry",
    "sampling",
    "simhash",
    "similarity",
    "subqueries",
    "text",
]
