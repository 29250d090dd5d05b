"""Manual skew mitigation: salted joins and two-phase aggregation.

AQE's skew-join handling (on in ``session.get_spark``) splits oversized
post-shuffle partitions automatically, but it only fires on sort-merge
joins and only at runtime sizes it can see. These operators are the
explicit fallback for the cases AQE can't fix at 100 TB:

- a hot key whose rows exceed one executor even after AQE splits
  (salting spreads ONE key across ``n_salts`` reducers);
- aggregations over heavy-hitter keys (two-phase: partial agg on the
  salted key, final agg on the key — same trick Spark's partial
  aggregation does per-task, extended across tasks);
- streaming stateful ops where AQE doesn't apply.

Both keep the transformation purely declarative (no UDFs), so Catalyst
still prunes/pushes around them.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed`` has heavy-hitter join keys and
    ``other`` is too large to broadcast but small enough to replicate
    ``n_salts``×.

    The skewed side gets a deterministic per-row salt (hash of the whole
    row, so re-computation under task retry is stable); the other side
    is replicated once per salt via a narrow explode. The join key
    becomes (key, salt): one hot key now lands on ``n_salts`` reducers
    instead of one. Replication cost is |other| × n_salts rows through
    the shuffle — pick n_salts ≈ hot-key rows / target partition rows.
    """
    if how not in ("inner", "left", "leftouter", "left_outer", "left_semi", "leftsemi"):
        # right/full outer would emit unmatched REPLICATED rows once per
        # salt — silently wrong; keep the salted form to join types
        # where replication only ever multiplies matches
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    keys = list(on)
    salted = skewed.withColumn(
        _SALT, F.pmod(F.hash(*[F.col(c) for c in skewed.columns]), F.lit(n_salts))
    )
    replicated = other.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted.join(replicated, on=keys + [_SALT], how=how).drop(_SALT)


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    count_alias: str | None = None,
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group-by keys, for the
    algebraic aggregates (sum/count/min/max) that re-aggregate losslessly:
    phase 1 aggregates (key, salt) — a hot key's rows split across
    ``n_salts`` reducers — phase 2 re-aggregates the ≤ n_salts partials
    per key. Output aliases: ``sum_<c>``, ``min_<c>``, ``max_<c>``, and
    ``count_alias`` for the row count."""
    ks = list(keys)
    salted = df.withColumn(
        _SALT, F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )
    p1 = [F.sum(c).alias(f"sum_{c}") for c in sum_cols]
    p1 += [F.min(c).alias(f"min_{c}") for c in min_cols]
    p1 += [F.max(c).alias(f"max_{c}") for c in max_cols]
    if count_alias:
        p1.append(F.count(F.lit(1)).alias(count_alias))
    partial = salted.groupBy(*ks, _SALT).agg(*p1)
    p2 = [F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols]
    p2 += [F.min(f"min_{c}").alias(f"min_{c}") for c in min_cols]
    p2 += [F.max(f"max_{c}").alias(f"max_{c}") for c in max_cols]
    if count_alias:
        p2.append(F.sum(count_alias).alias(count_alias))
    return partial.groupBy(*ks).agg(*p2)
