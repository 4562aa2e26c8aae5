from .jobs import (
    read_events_stream,
    run_bounded,
    streaming_session_window,
    streaming_topn_foreach_batch,
    streaming_uv_update,
    streaming_windowed_count,
)
from .sinks import foreach_batch_upsert, read_store
from .stateful import (
    streaming_blacklist,
    streaming_login_fail,
    streaming_order_timeout,
    streaming_pattern_pairs,
)

__all__ = [
    "read_events_stream",
    "run_bounded",
    "streaming_windowed_count",
    "streaming_session_window",
    "streaming_topn_foreach_batch",
    "streaming_uv_update",
    "streaming_login_fail",
    "streaming_order_timeout",
    "streaming_pattern_pairs",
    "streaming_blacklist",
    "foreach_batch_upsert",
    "read_store",
]
