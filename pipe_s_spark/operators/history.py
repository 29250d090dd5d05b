"""Changelog history operators: SCD Type-2 dimensions and point-in-time
snapshots.

These are the two classic warehouse consumers of a CDC stream that the
reference leaves to its MySQL sink (the reference replicates state; a
warehouse keeps history). Parity anchor: the per-key net-effect /
ordering semantics are the same contract the batch sink's compaction
enforces (/root/reference/pkg/output/mysql/batchmessage.go:25-105) —
here the full history is retained instead of collapsed.

Scale notes (100 TB): both operators are a single shuffle on the
change key (one window each); no driver-side data movement. SCD2's
window is per (table, pk) — cardinality of keys bounds the partition
skew, and a hot key only serializes its own history. Snapshots prune
with ``seq <= cutoff`` BEFORE the window, so the shuffle carries only
the prefix being reconstructed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_history(
    changelog: DataFrame,
    key_cols: Sequence[str] = ("table_name", "pk"),
    payload_cols: Sequence[str] = ("k", "value"),
    seq_col: str = "seq",
    ts_col: str = "ts_ms",
    op_col: str = "op",
) -> DataFrame:
    """Slowly-changing-dimension Type 2: one row per key VERSION.

    Every insert/update opens a version valid from its own event time
    until the NEXT event on the same key (of any operation — an update
    supersedes, a delete closes); the last open version per key is
    current. ``version`` numbers the surviving versions 1..n per key.

    The ``lead`` is computed over ALL ops, then deletes are dropped:
    a delete therefore closes its predecessor without emitting a row,
    and a later re-insert opens a fresh version — the standard SCD2
    treatment of CDC deletes.
    """
    keys = list(key_cols)
    w_all = Window.partitionBy(*keys).orderBy(seq_col)
    versions = (
        changelog.withColumn("valid_to", F.lead(ts_col).over(w_all))
        .filter(F.col(op_col) != "delete")
        .withColumn("version", F.row_number().over(w_all).cast("long"))
    )
    return versions.select(
        *keys,
        *payload_cols,
        F.col(ts_col).alias("valid_from"),
        "valid_to",
        "version",
        F.col("valid_to").isNull().alias("is_current"),
    )


def snapshot_asof(
    changelog: DataFrame,
    cutoff_seq,
    key_cols: Sequence[str] = ("table_name", "pk"),
    payload_cols: Sequence[str] = ("k", "value"),
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Reconstruct live table state as of ``cutoff_seq`` (inclusive).

    Point-in-time read over the changelog: per key, the latest event
    with ``seq <= cutoff`` wins (last-writer-wins, same order contract
    as the merge sink); a winning delete means the key did not exist
    at the cutoff. ``cutoff_seq`` is a one-row DataFrame with column
    ``cutoff`` (broadcast — stays a scalar at any scale) or an int.

    The cutoff filter runs BEFORE the ranking window, so only the
    historical prefix shuffles.
    """
    keys = list(key_cols)
    if isinstance(cutoff_seq, int):
        pruned = changelog.filter(F.col(seq_col) <= F.lit(cutoff_seq))
    else:
        pruned = changelog.join(F.broadcast(cutoff_seq)).filter(
            F.col(seq_col) <= F.col("cutoff")
        )
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
    return (
        pruned.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col(op_col) != "delete"))
        .select(*keys, *payload_cols, F.col(seq_col).alias("as_of_seq"))
    )


def scd2_apply(
    history: DataFrame | None,
    batch: DataFrame,
    key_cols: Sequence[str] = ("table_name", "pk"),
    payload_cols: Sequence[str] = ("k", "value"),
    seq_col: str = "seq",
    ts_col: str = "ts_ms",
    op_col: str = "op",
) -> DataFrame:
    """Incrementally fold one changelog chunk into an SCD2 history.

    The streaming form of :func:`scd2_history`: applying a changelog in
    ANY per-key-ordered chunking yields bit-identical history to one
    full-log rebuild (property-tested over random chunkings), because
    the fold preserves the invariants version-count = prior non-delete
    events and valid_to = next event's time:

    - untouched keys pass through;
    - a touched key's OPEN version closes at the chunk's first event
      time for that key (any op — an update supersedes, a delete
      closes);
    - the chunk's own versions (batch-local :func:`scd2_history`) are
      appended with their version numbers offset by the key's stored
      version count.

    Ordering contract: chunks must be per-key ordered (binlog segments
    / key-partitioned Kafka — the same assumption the reference's
    batch sink makes, batchoutput.go:164-190). Scale: two hash joins
    on the key + the batch-local window; the history table is only
    read, never re-windowed — per epoch the work is O(batch + touched
    history), not O(history).
    """
    keys = list(key_cols)
    batch_hist = scd2_history(batch, keys, payload_cols, seq_col, ts_col, op_col)
    if history is None:
        return batch_hist
    firsts = batch.groupBy(*keys).agg(F.min(ts_col).alias("__first_ts"))
    base_ver = history.groupBy(*keys).agg(F.max("version").alias("__base_ver"))

    untouched = history.join(firsts.select(*keys), keys, "left_anti")
    touched = history.join(firsts, keys)
    closed = touched.filter(F.col("valid_to").isNotNull()).drop("__first_ts")
    newly_closed = (
        touched.filter(F.col("valid_to").isNull())
        .withColumn("valid_to", F.col("__first_ts"))
        .withColumn("is_current", F.lit(False))
        .drop("__first_ts")
    )
    appended = (
        batch_hist.join(base_ver, keys, "left")
        .withColumn(
            "version", F.col("version") + F.coalesce("__base_ver", F.lit(0))
        )
        .drop("__base_ver")
    )
    return untouched.unionByName(closed).unionByName(newly_closed).unionByName(appended)
