"""Custom Python Data Source (SURVEY.md §2.1 S3/S4 widening) — the
Spark 4 ``pyspark.sql.datasource`` API, the first-class way to add a
connector without JVM code.

The reference hand-rolls ``SimulatedEventSource`` / ``LoginLog`` text
replays (LoginFailDetect's csv fixtures; SimulateEventSource's
RichParallelSourceFunction).  This source synthesizes the same
LoginLog-shaped rows (user_id, ip, event_type, ts) deterministically —
md5-derived columns, NO RNG state — so any read is reproducible and a
SQL oracle could regenerate it.

Engine-surface points demonstrated, each tested:

- **partition planning**: ``partitions()`` splits ``n_rows`` into
  ``n_partitions`` input splits read in parallel (the Python analog of
  a RichParallelSourceFunction's subtasks);
- **filter pushdown INTO a Python source** (Spark 4.1
  ``pushFilters``): supported ``EqualTo('event_type', v)`` filters are
  absorbed by the generator (it skips non-matching rows at the source)
  and removed from Spark's post-scan re-filter;
- **streaming reads**: ``LoginLogStreamReader`` exposes monotonically
  advancing row-offset ranges (``initialOffset``/``latestOffset``/
  ``partitions(start, end)``) — micro-batches of ``rows_per_batch``
  rows, replayable from any committed offset.

Register per session:  ``spark.dataSource.register(LoginLogDataSource)``
then ``spark.read.format("loginlog_synth").option(...).load()``.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    InputPartition,
)
from pyspark.sql.types import StructType

SCHEMA_DDL = "user_id bigint, ip string, event_type string, ts bigint"
EVENT_TYPES = ("success", "fail")
BASE_TS = 1_600_000_000


def _row(i: int, seed: int, n_users: int):
    """Deterministic row i: every field md5-derived from (seed, i)."""
    h = hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
    user = int(h[:8], 16) % n_users
    ip = ".".join(str(int(h[8 + 2 * k : 10 + 2 * k], 16)) for k in range(4))
    etype = EVENT_TYPES[int(h[16], 16) % len(EVENT_TYPES)]
    return (user, ip, etype, BASE_TS + i)


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class LoginLogReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.seed = int(options.get("seed", 0))
        self.n_users = int(options.get("n_users", 100))
        self.n_partitions = int(options.get("n_partitions", 4))
        self.etype_filter: str | None = None

    def pushFilters(self, filters):
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("event_type",):
                self.etype_filter = f.value
            else:
                yield f  # unsupported -> Spark re-applies post-scan

    def partitions(self):
        step = max(1, -(-self.n_rows // self.n_partitions))
        return [
            _Range(s, min(s + step, self.n_rows))
            for s in range(0, self.n_rows, step)
        ]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            r = _row(i, self.seed, self.n_users)
            if self.etype_filter is None or r[2] == self.etype_filter:
                yield r


class LoginLogStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.n_users = int(options.get("n_users", 100))
        self.seed = int(options.get("seed", 0))
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self._offset = 0

    def initialOffset(self):
        return {"offset": 0}

    def latestOffset(self):
        self._offset += self.rows_per_batch
        return {"offset": self._offset}

    def partitions(self, start, end):
        return [_Range(start["offset"], end["offset"])]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            yield _row(i, self.seed, self.n_users)

    def commit(self, end):
        pass  # offsets are derivable — nothing external to release


class LoginLogDataSource(DataSource):
    @classmethod
    def name(cls):
        return "loginlog_synth"

    def schema(self):
        return SCHEMA_DDL

    def reader(self, schema: StructType):
        return LoginLogReader(self.options)

    def streamReader(self, schema: StructType):
        return LoginLogStreamReader(self.options)
