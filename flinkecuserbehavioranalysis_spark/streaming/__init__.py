from .jobs import (
    read_events_stream,
    run_bounded,
    streaming_session_window,
    streaming_topn_foreach_batch,
    streaming_windowed_count,
)
from .stateful import streaming_login_fail, streaming_order_timeout

__all__ = [
    "read_events_stream",
    "run_bounded",
    "streaming_windowed_count",
    "streaming_session_window",
    "streaming_topn_foreach_batch",
    "streaming_login_fail",
    "streaming_order_timeout",
]
