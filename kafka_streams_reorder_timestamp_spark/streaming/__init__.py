from .reorder import reorder_stream
from .windows import session_agg, sliding_agg, stream_dedup, tumbling_agg

__all__ = [
    "reorder_stream",
    "session_agg",
    "sliding_agg",
    "stream_dedup",
    "tumbling_agg",
]
