"""Operator library — one module per capability family from SURVEY.md §2.

Every operator is a pure ``DataFrame -> DataFrame`` transform: it declares
a logical plan and returns it unexecuted, so Catalyst fuses the whole
query (filter pushdown, partial aggregation, broadcast selection) across
operator boundaries.  No operator collects to the driver.
"""

from .windows import sliding_window_count, topn_per_window, tumbling_window_count, windowed_count
from .distinct import windowed_distinct_count
from .patterns import blacklist_filter, consecutive_fail_alerts
from .timeout import create_pay_status
from .joins import interval_join, tx_match_full_outer
from .sessions import sessionize

__all__ = [
    "windowed_count",
    "tumbling_window_count",
    "sliding_window_count",
    "topn_per_window",
    "windowed_distinct_count",
    "consecutive_fail_alerts",
    "blacklist_filter",
    "create_pay_status",
    "interval_join",
    "tx_match_full_outer",
    "sessionize",
]
