"""Consistency checker — source vs target diff as a join.

Parity: ``MysqlCheckOutput`` (/root/reference/pkg/output/mysql/check/
checkoutput.go): buffers source rows per table, batch-SELECTs the
target by PK (checkoutput.go:486-502), compares field-by-field
(:429-445) and classifies ``row_miss`` / ``row_diff`` (:30-33), writing
a diff report. The reference streams this row-at-a-time; in Spark the
whole check is two distributed joins:

- misses: ``src LEFT ANTI JOIN tgt ON pk``
- diffs:  ``src JOIN tgt ON pk`` where any compared column differs
  (null-safe)

Scale: both joins shuffle on the PK once; with both sides bucketed or
pre-partitioned by PK it is shuffle-free. The optional "recheck"
filter (skip rows updated in the last N seconds, checkoutput.go:312-321)
maps to a timestamp predicate pushed to the scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_consistency(
    src: DataFrame,
    tgt: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
    updated_at_col: str | None = None,
    skip_recent_seconds: int | None = None,
    recheck_src: DataFrame | None = None,
) -> DataFrame:
    """Return a diff report DataFrame: key columns + ``diff_type``
    ('row_miss' | 'row_diff'). Empty result == consistent (the e2e
    integrity loop's golden output, integration_test/dbsync/
    data_integrity_test_linux.sh:135-144).

    ``recheck_src``: a FRESH read of the source (parity with the
    reference's second-pass recheck, checkoutput.go:349-412). Candidate
    diffs whose source row changed — or vanished — between the snapshot
    (``src``) and the recheck read are dropped from the report: they are
    rows caught mid-update by the snapshot, not real inconsistencies.
    An online check re-reads only candidate keys, so pass a keyed/pruned
    re-read at scale."""
    keys = list(key_cols)
    if compare_cols is None:
        compare_cols = [c for c in src.columns if c not in keys and c in tgt.columns]

    if updated_at_col and skip_recent_seconds:
        cutoff = F.current_timestamp() - F.expr(f"INTERVAL {skip_recent_seconds} SECONDS")
        src = src.filter(F.col(updated_at_col) < cutoff)

    t = tgt.select(keys + [F.col(c).alias(f"__t_{c}") for c in compare_cols])

    misses = (
        src.join(t, on=keys, how="left_anti")
        .select(*keys)
        .withColumn("diff_type", F.lit("row_miss"))
    )

    differs = F.lit(False)
    for c in compare_cols:
        differs = differs | ~F.col(c).eqNullSafe(F.col(f"__t_{c}"))
    diffs = (
        src.join(t, on=keys, how="inner")
        .filter(differs)
        .select(*keys)
        .withColumn("diff_type", F.lit("row_diff"))
    )
    report = misses.unionByName(diffs)

    if recheck_src is not None:
        fresh = recheck_src.select(
            keys
            + [F.col(c).alias(f"__f_{c}") for c in compare_cols]
            + [F.lit(1).alias("__f_present")]
        )
        snap = src.select(keys + list(compare_cols))
        # a key is unstable if its source row changed or vanished
        # between snapshot and recheck
        src_changed = F.col("__f_present").isNull()
        for c in compare_cols:
            src_changed = src_changed | ~F.col(c).eqNullSafe(F.col(f"__f_{c}"))
        unstable = (
            snap.join(fresh, on=keys, how="left")
            .filter(src_changed)
            .select(*keys)
            .distinct()
        )
        report = report.join(unstable, on=keys, how="left_anti")
    return report
