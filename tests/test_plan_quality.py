"""Plan-quality guardrails over the whole query surface.

Asserts, for every registered query's physical plan:

- no ``BatchEvalPython`` (row-at-a-time Python UDF) — Python touches
  data only through Arrow (``mapInPandas``/``applyInPandas``/pandas
  UDAF), which shows as ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas;
- no cartesian/broadcast-nested-loop joins outside the explicit
  allowlist of intentionally cross-product baselines.

This keeps "the plan you'd want at 100 TB" an enforced property, not a
one-time review.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"

#: Queries whose cross product is the documented intent (broadcast
#: query-side baselines where the corpus streams map-side).
CROSS_OK = {"sim_cosine_topk"}

#: Scalar-subquery shapes: the nested-loop join's build side is a
#: broadcast SINGLE-ROW global aggregate (verified in plan) — the
#: correct plan for `col > (SELECT agg FROM ...)` at any scale.
SCALAR_OK = {"q11_important_parts", "q22_idle_customers"}

_QUERIES = sorted(entrymod.queries().items())


@pytest.mark.parametrize("name,fn", _QUERIES, ids=[n for n, _ in _QUERIES])
def test_plan_has_no_row_python_and_no_stray_cross_join(spark, name, fn):
    plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF in plan"
    if name not in CROSS_OK:
        assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
        if name not in SCALAR_OK:
            assert "BroadcastNestedLoopJoin" not in plan, (
                f"{name}: nested-loop join in plan"
            )
