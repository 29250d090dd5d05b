"""Stream-stream event-time joins and watermark-scoped dedup.

The reference never joins two live streams — its pipeline is a single
binlog stream applied to static targets (task.go's one-input
component chain). Structured Streaming makes the two-stream case a
first-class operator: both sides buffer keyed state, the event-time
interval condition bounds how long a row can still find a partner,
and the watermark evicts state past that bound — this is the 100 TB
answer to "attribute each purchase to the click that caused it"
without ever materializing either side as a static table.

Scale notes:

- The join is a keyed state-store equi-join: both streams shuffle on
  the join key once, state lives in the (RocksDB-capable) state store
  partitioned the same way — no cross product anywhere.
- The INTERVAL condition is what makes state finite: a row older than
  ``watermark + interval span`` can never match again and is evicted.
  Without it, two infinite streams would buffer forever.
- ``dedup_within_watermark`` is the streaming form of exact dedup
  whose state is also watermark-bounded: at 100 TB/day you cannot keep
  every key ever seen (streaming_dedup's contract) — you keep keys for
  the dedup horizon only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
    watermark_s: int,
    how: str = "inner",
) -> DataFrame:
    """Join two STREAMING DataFrames on ``on`` where
    ``right_ts - left_ts`` lies in ``[lower_s, upper_s]`` seconds.

    Both sides get a ``watermark_s``-second watermark; the interval
    condition + watermark bound the state store (rows past
    ``watermark + span`` are evicted, which is also what licenses
    ``leftOuter``/``rightOuter`` to emit null-padded rows at all).
    Column names other than ``on`` must be disjoint between the sides
    (rename before calling); the right key column is dropped.
    """
    if lower_s > upper_s:
        raise ValueError("lower_s must be <= upper_s")
    lw = left.withWatermark(left_ts, f"{watermark_s} seconds")
    rw = right.withWatermark(right_ts, f"{watermark_s} seconds")
    rk = f"__r_{on}"
    rw = rw.withColumnRenamed(on, rk)
    cond = (
        (F.col(on) == F.col(rk))
        & (F.col(right_ts) >= F.expr(f"{left_ts} + INTERVAL {lower_s} SECONDS"))
        & (F.col(right_ts) <= F.expr(f"{left_ts} + INTERVAL {upper_s} SECONDS"))
    )
    return lw.join(rw, cond, how).drop(rk)


def dedup_within_watermark(
    stream: DataFrame, keys: list[str], ts_col: str, watermark_s: int
) -> DataFrame:
    """Exact streaming dedup whose key state is WATERMARK-BOUNDED:
    a duplicate arriving within ``watermark_s`` seconds of the first
    occurrence is dropped; state for older keys is evicted (unlike
    ``streaming_dedup``, whose every-key-ever state only suits bounded
    key domains). This is the right dedup for at-least-once ingestion
    retries, which cluster within seconds of the original."""
    return stream.withWatermark(ts_col, f"{watermark_s} seconds").dropDuplicatesWithinWatermark(
        keys
    )
