"""Engine-type-skew sweep over every registered oracle.

DuckDB widens some aggregates beyond what Spark (and pandas) can hold
natively: SUM(BIGINT) -> HUGEINT, which ``fetchdf()`` materializes as
float64 while Spark returns int64 — a dtype-sensitive value hash then
rejects numerically-equal results (this kept ``text_lang_summary`` red
for four driver rounds).  This sweep runs ``DESCRIBE`` on each oracle
(schema-only — no data is scanned, so it is cheap even as the registry
grows) and fails on any output column whose DuckDB type is known to
change dtype under ``fetchdf()``:

- HUGEINT / UHUGEINT  -> float64   (cast to BIGINT in the oracle)
- DECIMAL(p,s)        -> float64 via object in older pandas; Spark-side
                         is usually double already, but an explicit
                         CAST(... AS DOUBLE) keeps both engines aligned.

New queries cannot reintroduce the hazard without tripping this test.
"""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as entry
from tests.oracle_harness import duck_con

SF_DIR = "/root/testdata/sf0.001"

HAZARD_TYPES = re.compile(r"^(U?HUGEINT|DECIMAL\b.*)$", re.IGNORECASE)


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(entry.oracle_sql()))
def test_oracle_output_types(con, name):
    sql = entry.oracle_sql()[name]
    desc = con.execute(f"DESCRIBE ({sql})").fetchall()
    hazards = [(col, typ) for col, typ, *_ in desc if HAZARD_TYPES.match(typ)]
    assert not hazards, (
        f"{name}: oracle output column(s) {hazards} use a DuckDB type that "
        "fetchdf() converts to a different dtype than Spark produces — add an "
        "explicit CAST (BIGINT for HUGEINT sums, DOUBLE for DECIMAL) so the "
        "driver's dtype-sensitive hash sees identical dtypes on both sides"
    )
