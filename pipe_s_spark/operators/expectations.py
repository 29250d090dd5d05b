"""Declarative data-expectations suite (the Deequ / Great-Expectations
shape): a set of named constraints over one table, COMPILED INTO A
SINGLE AGGREGATE PASS so the whole suite costs one scan of the fact
table no matter how many checks it carries.

Reference parity: this is the batch generalization of
`pkg/output/mysql/checkoutput.go:293-445` (MysqlCheckOutput), whose
job is "verify what landed matches what was expected" row-by-row; here
the expectations are column-level invariants (nullability, uniqueness,
domains, ranges, referential integrity) evaluated corpus-wide, the way
an ingestion gate or a nightly data-quality monitor runs them.

At-scale design
---------------
- Every row-local check (not_null / in_set / in_range / matches /
  custom predicate) becomes one conditional-count column in ONE
  ``df.agg(...)`` — map-side partial aggregation collapses each task to
  a single row, the shuffle moves #checks integers per task.
- ``unique`` compiles to ``COUNT(*) - COUNT(DISTINCT struct(cols))``
  inside the same aggregate (Catalyst's Expand; still one scan).
- ``foreign_key`` joins the fact side against the broadcast DISTINCT
  key set of the dimension BEFORE the aggregate, so N referential
  checks + M row checks are still one scan: fact -> N broadcast left
  joins -> one agg. No driver-side count() actions anywhere; ``run``
  returns a lazy DataFrame.
- The report is vocabulary-sized (one row per check): collect-safe.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class _RowCheck:
    name: str
    violation: Column  # boolean: True = this row violates the check


@dataclass
class _UniqueCheck:
    name: str
    cols: tuple[str, ...]


@dataclass
class _FkCheck:
    name: str
    col: str
    dim: DataFrame
    dim_col: str


@dataclass
class _AggCheck:
    name: str
    expr: Column  # aggregate expression evaluated over the whole table
    lo: object
    hi: object


@dataclass
class ExpectationSuite:
    """Named constraints over one table; ``run(df)`` emits the report.

    Report schema: ``check`` (string), ``violations`` (bigint, rows
    failing the constraint), ``total`` (bigint, rows scanned),
    ``passed`` (boolean, violations == 0).
    """

    table: str
    _rows: list[_RowCheck] = field(default_factory=list)
    _uniques: list[_UniqueCheck] = field(default_factory=list)
    _fks: list[_FkCheck] = field(default_factory=list)
    _aggs: list[_AggCheck] = field(default_factory=list)

    # -- constraint builders (fluent) -----------------------------------
    def not_null(self, col: str) -> "ExpectationSuite":
        self._rows.append(_RowCheck(f"not_null:{col}", F.col(col).isNull()))
        return self

    def in_set(self, col: str, values: Sequence) -> "ExpectationSuite":
        self._rows.append(
            _RowCheck(
                f"in_set:{col}",
                F.col(col).isNotNull() & ~F.col(col).isin(list(values)),
            )
        )
        return self

    def in_range(self, col: str, lo=None, hi=None) -> "ExpectationSuite":
        c = F.col(col)
        bad = F.lit(False)
        if lo is not None:
            bad = bad | (c < F.lit(lo))
        if hi is not None:
            bad = bad | (c > F.lit(hi))
        self._rows.append(_RowCheck(f"in_range:{col}", c.isNotNull() & bad))
        return self

    def matches(self, col: str, regex: str) -> "ExpectationSuite":
        self._rows.append(
            _RowCheck(f"matches:{col}", F.col(col).isNotNull() & ~F.col(col).rlike(regex))
        )
        return self

    def satisfies(self, name: str, predicate: Column) -> "ExpectationSuite":
        """Custom row-level constraint: ``predicate`` is the PASS
        condition; null predicate results count as violations."""
        self._rows.append(
            _RowCheck(f"satisfies:{name}", ~F.coalesce(predicate, F.lit(False)))
        )
        return self

    def unique(self, *cols: str) -> "ExpectationSuite":
        self._uniques.append(_UniqueCheck("unique:" + ",".join(cols), tuple(cols)))
        return self

    def agg_between(self, name: str, expr: Column, lo=None, hi=None) -> "ExpectationSuite":
        """TABLE-level constraint on an aggregate (Deequ's hasMean /
        hasApproxQuantile class): ``expr`` is any aggregate expression;
        the check fails (violations = 1) when the value falls outside
        [lo, hi] or is null. Rides in the same single aggregate pass
        as every other check."""
        self._aggs.append(_AggCheck(f"agg:{name}", expr, lo, hi))
        return self

    def foreign_key(self, col: str, dim: DataFrame, dim_col: str) -> "ExpectationSuite":
        self._fks.append(_FkCheck(f"foreign_key:{col}", col, dim, dim_col))
        return self

    # -- compilation ----------------------------------------------------
    def run(self, df: DataFrame) -> DataFrame:
        """Compile the suite to one aggregate over ``df`` and return the
        lazy report DataFrame (one row per check)."""
        enriched = df
        fk_flags: list[tuple[str, str]] = []
        for i, fk in enumerate(self._fks):
            marker = f"__fk_hit_{i}"
            keys = F.broadcast(
                fk.dim.select(F.col(fk.dim_col).alias(f"__fk_key_{i}"))
                .where(F.col(fk.dim_col).isNotNull())
                .distinct()
                .withColumn(marker, F.lit(True))
            )
            enriched = enriched.join(
                keys, F.col(fk.col) == F.col(f"__fk_key_{i}"), "left"
            ).drop(f"__fk_key_{i}")
            fk_flags.append((fk.name, marker))

        aggs = [F.count(F.lit(1)).alias("__total")]
        names: list[str] = []
        for rc in self._rows:
            alias = f"__v_{len(names)}"
            aggs.append(
                F.sum(F.when(rc.violation, F.lit(1)).otherwise(F.lit(0)))
                .cast("long")
                .alias(alias)
            )
            names.append(rc.name)
        for uq in self._uniques:
            alias = f"__v_{len(names)}"
            # NULL-key rows are excluded (not_null's business, the same
            # convention in_set/in_range/foreign_key follow): struct(null)
            # is non-null, so a bare COUNT(DISTINCT struct(cols)) would
            # count all-null keys as one distinct group while SQL
            # COUNT(DISTINCT col) (and Deequ) ignore them. Guarding with
            # WHEN(all-non-null) makes count_distinct skip those rows,
            # and the row base shrinks to the same population.
            all_nn = F.lit(True)
            for c in uq.cols:
                all_nn = all_nn & F.col(c).isNotNull()
            aggs.append(
                (
                    F.sum(F.when(all_nn, F.lit(1)).otherwise(F.lit(0)))
                    - F.count_distinct(
                        F.when(all_nn, F.struct(*[F.col(c) for c in uq.cols]))
                    )
                )
                .cast("long")
                .alias(alias)
            )
            names.append(uq.name)
        for ac in self._aggs:
            alias = f"__v_{len(names)}"
            bad = F.lit(False)
            if ac.lo is not None:
                bad = bad | (ac.expr < F.lit(ac.lo))
            if ac.hi is not None:
                bad = bad | (ac.expr > F.lit(ac.hi))
            # null aggregate (e.g. avg of an all-null column) fails
            aggs.append(
                F.when(F.coalesce(~bad, F.lit(False)), F.lit(0))
                .otherwise(F.lit(1))
                .cast("long")
                .alias(alias)
            )
            names.append(ac.name)
        for i, (fk_name, marker) in enumerate(fk_flags):
            alias = f"__v_{len(names)}"
            # A fact row violates the FK when its key is non-null and no
            # dimension key matched; null FKs are not-null's business.
            aggs.append(
                F.sum(
                    F.when(
                        F.col(marker).isNull() & F.col(self._fks[i].col).isNotNull(),
                        F.lit(1),
                    ).otherwise(F.lit(0))
                )
                .cast("long")
                .alias(alias)
            )
            names.append(fk_name)

        one = enriched.agg(*aggs)
        pairs = F.array(
            *[
                F.struct(
                    F.lit(n).alias("check"), F.col(f"__v_{i}").alias("violations")
                )
                for i, n in enumerate(names)
            ]
        )
        return (
            one.select(F.col("__total"), F.explode(pairs).alias("p"))
            .select(
                F.lit(self.table).alias("tbl"),
                F.col("p.check").alias("check"),
                F.col("p.violations").alias("violations"),
                F.col("__total").cast("long").alias("total"),
                (F.col("p.violations") == 0).alias("passed"),
            )
        )


    def tag(self, df: DataFrame, tag_col: str = "_violated") -> DataFrame:
        """ROW-LEVEL compilation: append ``tag_col`` — the array of
        check names each row violates (empty array = clean row). This
        is the quarantine/dead-letter form (Delta Live Tables'
        expectations): rows are routed, not just counted, so it works
        on unbounded streams too (FK checks become stream-static
        broadcast joins; ``unique`` has no row-local meaning and is
        rejected)."""
        if self._uniques or self._aggs:
            raise ValueError(
                "unique/agg checks are corpus-level, not row-level; "
                "use run() for the aggregate report"
            )
        enriched = df
        flags: list[tuple[str, Column]] = [
            (rc.name, rc.violation) for rc in self._rows
        ]
        for i, fk in enumerate(self._fks):
            marker = f"__fk_hit_{i}"
            keys = F.broadcast(
                fk.dim.select(F.col(fk.dim_col).alias(f"__fk_key_{i}"))
                .where(F.col(fk.dim_col).isNotNull())
                .distinct()
                .withColumn(marker, F.lit(True))
            )
            enriched = enriched.join(
                keys, F.col(fk.col) == F.col(f"__fk_key_{i}"), "left"
            ).drop(f"__fk_key_{i}")
            flags.append(
                (fk.name, F.col(marker).isNull() & F.col(fk.col).isNotNull())
            )
        tags = F.filter(
            F.array(
                *[F.when(cond, F.lit(name)).otherwise(F.lit(None)) for name, cond in flags]
            ),
            lambda x: x.isNotNull(),
        )
        out = enriched.withColumn(tag_col, tags)
        for i in range(len(self._fks)):
            out = out.drop(f"__fk_hit_{i}")
        return out


def suite_from_spec(spec: Sequence[dict], table: str = "t", spark=None) -> ExpectationSuite:
    """Build a suite from a JSON-able check list (the pipeline-runner
    front-end; mirrors how every reference component is configured by
    `Configure(StringMap)`, `pkg/utils/config.go:80-82`). Kinds:
    ``not_null`` / ``in_set`` / ``in_range`` / ``matches`` /
    ``satisfies`` (SQL expr = pass condition) / ``foreign_key``
    (``dimPath`` parquet + ``dimCol``; needs ``spark``)."""
    s = ExpectationSuite(table)
    for c in spec:
        kind = c.get("kind")
        if kind == "not_null":
            s.not_null(c["col"])
        elif kind == "in_set":
            s.in_set(c["col"], c["values"])
        elif kind == "in_range":
            s.in_range(c["col"], c.get("lo"), c.get("hi"))
        elif kind == "matches":
            s.matches(c["col"], c["regex"])
        elif kind == "satisfies":
            s.satisfies(c["name"], F.expr(c["expr"]))
        elif kind == "unique":
            s.unique(*c["cols"])
        elif kind == "agg_between":
            s.agg_between(c["name"], F.expr(c["expr"]), c.get("lo"), c.get("hi"))
        elif kind == "foreign_key":
            if spark is None:
                raise ValueError("foreign_key in a spec needs a SparkSession")
            s.foreign_key(c["col"], spark.read.parquet(c["dimPath"]), c["dimCol"])
        else:
            raise ValueError(f"unknown check kind: {kind!r}")
    return s


def run_suites(suites: Sequence[tuple[ExpectationSuite, DataFrame]]) -> DataFrame:
    """Union the reports of several (suite, table-DataFrame) pairs into
    one cross-table data-quality report — each table still costs exactly
    one scan."""
    out = None
    for suite, df in suites:
        rep = suite.run(df)
        out = rep if out is None else out.unionByName(rep)
    if out is None:
        raise ValueError("no suites given")
    return out
