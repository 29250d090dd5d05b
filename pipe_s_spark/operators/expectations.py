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


def _sql_str(s: str) -> str:
    """SQL string literal with Spark's default escape rules (backslash
    IS an escape character when escapedStringLiterals=false)."""
    return "'" + str(s).replace("\\", "\\\\").replace("'", "\\'") + "'"


def _sql_lit(v) -> str:
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        return f"{v!r}D"  # double literal, matching F.lit(float)
    return _sql_str(v)


def _q(col: str) -> str:
    return f"`{col}`"


@dataclass
class _RowCheck:
    name: str
    # boolean: True = this row violates the check. A SQL string for the
    # library-generated predicates (compiled into ONE parsed expression
    # — ~200 py4j round trips per suite profiled at 0.3-0.5 s of pure
    # DataFrame-construction time, r16 driver-floor work), a Column for
    # caller-supplied predicates (satisfies()).
    violation: str | Column


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
    # Library-generated predicates are stored as SQL text and parsed in
    # ONE F.expr each at run() time; building them as Column trees cost
    # a py4j round trip per operator (~0.3-0.5 s of driver time per
    # suite construction). Semantics identical: the SQL forms are the
    # textual rendering of the former Column expressions.
    def not_null(self, col: str) -> "ExpectationSuite":
        self._rows.append(_RowCheck(f"not_null:{col}", f"({_q(col)} IS NULL)"))
        return self

    def in_set(self, col: str, values: Sequence) -> "ExpectationSuite":
        vals = ", ".join(_sql_lit(v) for v in values)
        self._rows.append(
            _RowCheck(
                f"in_set:{col}",
                f"({_q(col)} IS NOT NULL AND {_q(col)} NOT IN ({vals}))",
            )
        )
        return self

    def in_range(self, col: str, lo=None, hi=None) -> "ExpectationSuite":
        bad = ["FALSE"]
        if lo is not None:
            bad.append(f"{_q(col)} < {_sql_lit(lo)}")
        if hi is not None:
            bad.append(f"{_q(col)} > {_sql_lit(hi)}")
        self._rows.append(
            _RowCheck(
                f"in_range:{col}",
                f"({_q(col)} IS NOT NULL AND ({' OR '.join(bad)}))",
            )
        )
        return self

    def matches(self, col: str, regex: str) -> "ExpectationSuite":
        self._rows.append(
            _RowCheck(
                f"matches:{col}",
                f"({_q(col)} IS NOT NULL AND NOT ({_q(col)} RLIKE {_sql_str(regex)}))",
            )
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

        # Compile the whole aggregate as SQL text where possible — ONE
        # F.expr per check instead of a py4j round trip per operator
        # (r16: profiled 0.3-0.5 s of pure DataFrame-construction time
        # per suite under the old Column-tree form). Caller-supplied
        # Columns (satisfies / agg_between) cannot be stringified and
        # keep the Column path; agg() mixes both freely.
        aggs = [F.expr("CAST(COUNT(1) AS BIGINT) AS __total")]
        names: list[str] = []
        for rc in self._rows:
            alias = f"__v_{len(names)}"
            if isinstance(rc.violation, str):
                aggs.append(
                    F.expr(
                        f"CAST(SUM(CASE WHEN {rc.violation} THEN 1 ELSE 0 END)"
                        f" AS BIGINT) AS {alias}"
                    )
                )
            else:
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
            all_nn = " AND ".join(f"{_q(c)} IS NOT NULL" for c in uq.cols)
            pairs_sql = ", ".join(f"{_sql_str(c)}, {_q(c)}" for c in uq.cols)
            aggs.append(
                F.expr(
                    f"CAST(SUM(CASE WHEN {all_nn} THEN 1 ELSE 0 END)"
                    f" - COUNT(DISTINCT CASE WHEN {all_nn}"
                    f" THEN named_struct({pairs_sql}) END) AS BIGINT) AS {alias}"
                )
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
                F.expr(
                    f"CAST(SUM(CASE WHEN {_q(marker)} IS NULL"
                    f" AND {_q(self._fks[i].col)} IS NOT NULL"
                    f" THEN 1 ELSE 0 END) AS BIGINT) AS {alias}"
                )
            )
            names.append(fk_name)

        one = enriched.agg(*aggs)
        pairs = ", ".join(
            f"named_struct('check', {_sql_str(n)}, 'violations', `__v_{i}`)"
            for i, n in enumerate(names)
        )
        return one.selectExpr("__total", f"explode(array({pairs})) AS p").selectExpr(
            f"{_sql_str(self.table)} AS tbl",
            "p.check AS check",
            "p.violations AS violations",
            "CAST(__total AS BIGINT) AS total",
            "(p.violations = 0) AS passed",
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
            (
                rc.name,
                F.expr(rc.violation) if isinstance(rc.violation, str) else rc.violation,
            )
            for rc in self._rows
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
