"""Session-scoped materialized intermediates — the in-session analog of
the persisted signature/clusters tables every production dedup pipeline
writes once and consumes many times.

Motivation (scale first): a MinHash pipeline at corpus scale never
recomputes signatures per downstream consumer — it writes the narrow
``(doc_id, h0..h15)`` table to parquet once, and banding, verification,
decontamination and cluster resolution all read that table. Inside one
SparkSession the equivalent is a ``localCheckpoint``-ed DataFrame shared
by every query that needs it. This module provides exactly that: a
keyed, bounded, session-aware memo of checkpointed DataFrames.

What is (and is not) safe to cache here:

- CACHE narrow derived tables whose size is O(documents) rows x few
  columns (MinHash signatures, candidate-pair counts, cluster labels).
  These are the tables a cluster job would persist to parquet anyway.
- DO NOT cache corpus-sized relations (the exploded shingle table —
  O(total tokens) rows). At 100 TB those don't fit anywhere but the
  source; each query re-derives them in a narrow map that fuses into
  its own scan.

Correctness: builders must be deterministic pure functions of
``(sf_dir, params)`` — every cached table here is, because all hashes
are md5-derived (see functions.dedup). Entries are keyed by Spark
``applicationId`` so a new session never sees another session's RDDs,
and the memo is bounded (FIFO eviction with unpersist) so a long
driver session cannot accumulate executor storage without limit.
"""

from __future__ import annotations

from collections import OrderedDict
from collections.abc import Callable, Hashable

from pyspark.sql import DataFrame, SparkSession

#: Max live entries; each is a narrow checkpointed table (a few MB at
#: bench scale). FIFO eviction unpersists the evicted RDD.
MAX_ENTRIES = 32

_memo: OrderedDict[tuple, DataFrame] = OrderedDict()


def materialized(
    spark: SparkSession, key: tuple[Hashable, ...], builder: Callable[[], DataFrame]
) -> DataFrame:
    """Return the checkpointed DataFrame for ``key``, building it with
    ``builder()`` on first use in this Spark application.

    ``key`` must capture every parameter the builder's output depends
    on (sf_dir, hash family size, caps, thresholds, ...).
    """
    full_key = (spark.sparkContext.applicationId, *key)
    df = _memo.get(full_key)
    if df is not None:
        _memo.move_to_end(full_key)
        return df
    df = builder().localCheckpoint(eager=True)
    _memo[full_key] = df
    while len(_memo) > MAX_ENTRIES:
        _, old = _memo.popitem(last=False)
        try:
            old.unpersist()
        except Exception:  # session may already be stopped
            pass
    return df


def clear() -> None:
    """Drop every memo entry (tests; session teardown)."""
    while _memo:
        _, old = _memo.popitem(last=False)
        try:
            old.unpersist()
        except Exception:
            pass
