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
#: bench scale). FIFO eviction drops the memo entry but does NOT
#: unpersist: localCheckpoint truncates lineage, so a caller (or a
#: derived lazy plan) still holding an evicted handle would fail with
#: lost-block errors instead of recomputing. Evicted handles park in
#: ``_evicted`` and are reclaimed by ``clear()`` / session teardown —
#: safe because every entry is a narrow table of a few MB, and the
#: registered query surface keeps live keys (~7 per sf_dir) far below
#: this bound (asserted in tests/test_shared_cache.py).
MAX_ENTRIES = 32

_memo: OrderedDict[tuple, DataFrame] = OrderedDict()
#: Evicted-but-possibly-still-referenced checkpoints, reclaimed in clear().
_evicted: list[DataFrame] = []
#: Append-only log of BUILD events — ``(full_key, build_seconds)``
#: pairs for every builder that actually ran — drained by the bench.
#: Key-snapshot diffs (live_keys before/after) miss churn: a key
#: built, FIFO-evicted, then REBUILT inside a timed run is net-absent
#: from the snapshot diff, so the rebuild cost inside the reported
#: median went unattributed (r9 advice). An event log counts builds,
#: not net key presence. r16 (verdict #3): each event carries the
#: BUILD WALL SECONDS so the artifact can publish the cold cost of
#: every memoized family — a memo-consuming query's median measures a
#: warm table, and without the build seconds beside it a cache shift
#: reads as a speedup.
_build_log: list[tuple] = []
#: Callbacks invoked by clear() — lets sibling driver-side memos
#: (e.g. the centroid literal-matrix cache) share this module's
#: teardown hook instead of growing unbounded across sessions.
_clear_hooks: list[Callable[[], None]] = []


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
    import time

    t0 = time.perf_counter()
    built = builder()
    # a DRIVER-LOCAL relation (e.g. connected_components' bounded edge
    # fold returns createDataFrame of the resolved labels) has no
    # executor lineage to truncate and nothing to pin — checkpointing
    # it only buys a ~1.7 s first-use codepath warmup (measured) and a
    # pointless 32-task job; downstream consumers broadcast it anyway
    df = built if built.isLocal() else built.localCheckpoint(eager=True)
    _build_log.append((full_key, round(time.perf_counter() - t0, 4)))
    _memo[full_key] = df
    while len(_memo) > MAX_ENTRIES:
        # Deliberately no unpersist here — see MAX_ENTRIES comment:
        # an evicted checkpoint may still back a caller's lazy plan.
        _, old = _memo.popitem(last=False)
        _evicted.append(old)
    return df


#: Driver-side scalar memo (corpus counts, trained parameter tuples) —
#: same keying/lifetime discipline as the DataFrame memo, for values
#: that are a single Spark JOB to compute (e.g. COUNT(*) sizing an LSH
#: signature): rerunning that job per query invocation is a full extra
#: pass over the corpus at real scale and 4x per bench entry (r9
#: advice, queries_sim).
_scalars: dict[tuple, object] = {}


def scalar(
    spark: SparkSession, key: tuple[Hashable, ...], builder: Callable[[], object]
) -> object:
    """Return the memoized scalar for ``key``, computing it once per
    Spark application. Builds are appended to the build log so the
    bench attributes the one-off job like any other cache build."""
    full_key = (spark.sparkContext.applicationId, *key)
    if full_key not in _scalars:
        import time

        t0 = time.perf_counter()
        _scalars[full_key] = builder()
        _build_log.append((full_key, round(time.perf_counter() - t0, 4)))
    return _scalars[full_key]


def live_keys() -> set[tuple]:
    """Snapshot of the memo's live keys (applicationId included) —
    read-only introspection so the bench can attribute, per query,
    which shared tables were BUILT during its runs vs already
    memoized (a cache build hiding inside one query's timing is
    otherwise indistinguishable from a plan regression)."""
    return set(_memo.keys())


def drain_build_log() -> list[tuple]:
    """Return and clear the accumulated build events —
    ``(full_key, build_seconds)`` in build order, duplicates preserved.
    Unlike :func:`live_keys` snapshot diffs this attributes REBUILDS
    after FIFO eviction, so the bench's built_timed field is
    churn-proof."""
    global _build_log
    out, _build_log = _build_log, []
    return out


def on_clear(hook: Callable[[], None]) -> None:
    """Register a teardown callback run by :func:`clear` (idempotent)."""
    if hook not in _clear_hooks:
        _clear_hooks.append(hook)


def clear() -> None:
    """Drop every memo entry, reclaim evicted checkpoints, and run
    registered sibling-cache hooks (tests; session teardown)."""
    while _memo:
        _, old = _memo.popitem(last=False)
        _evicted.append(old)
    _scalars.clear()
    _build_log.clear()
    while _evicted:
        old = _evicted.pop()
        try:
            old.unpersist()
        except Exception:  # session may already be stopped
            pass
    for hook in _clear_hooks:
        hook()
