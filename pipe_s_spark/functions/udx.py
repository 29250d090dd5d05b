"""User-defined extension surface: vectorized UDAF + Python UDTF.

The reference's only extensibility point is the ``Processor`` interface
plus component registration (/root/reference/pkg/core/component.go:23-26,
pkg/builder/componentbuilder.go:42-44) — per-row Go callbacks. The Spark
restatement keeps user code OUT of the row loop:

- custom aggregates are Arrow-batched ``pandas_udf`` grouped aggregates
  (vectorized over whole partitions, usable in ``groupBy().agg`` and
  windows);
- custom table functions are Python UDTFs (PySpark 4): one class per
  operator, registered once, callable from SQL — the declarative
  sibling of the Processor registry in ``plans/runner.py``.

Everything here is demonstration-grade but tested; heavy numerics
belong in the built-in expression library first (see functions/exact.py
for why).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import SparkSession


def geometric_mean_udaf():
    """Grouped-agg UDAF: exp(mean(ln x)) over positive values — an
    aggregate Spark lacks natively, vectorized via Arrow (no per-row
    Python). Built lazily: type resolution needs an active session."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geometric_mean(v: pd.Series) -> float:
        import numpy as np

        x = v.dropna()
        x = x[x > 0]
        if len(x) == 0:
            return float("nan")
        return float(np.exp(np.log(x.to_numpy()).mean()))

    return geometric_mean


class TokenizeDocs:
    """UDTF: explode a document into (ord, token) rows — the
    table-function shape of the text pipeline's tokenizer (one input
    row -> N output rows, lateral-joinable in SQL).

    Register + use::

        spark.udtf.register("tokenize_docs", tokenize_docs_udtf())
        spark.sql("SELECT d.doc_id, t.ord, t.token
                   FROM docs d, LATERAL tokenize_docs(d.text) t")
    """

    def eval(self, text: str):  # noqa: D102 — UDTF contract
        for i, tok in enumerate((text or "").lower().split()):
            if tok:
                yield i, tok


def tokenize_docs_udtf():
    """Build the UDTF handle (lazy import keeps module import cheap)."""
    from pyspark.sql.functions import udtf

    return udtf(TokenizeDocs, returnType="ord int, token string")


def register_udx(spark: SparkSession) -> None:
    """Register the extension functions for SQL use (the analog of the
    reference's component registry init)."""
    spark.udf.register("geometric_mean", geometric_mean_udaf())
    spark.udtf.register("tokenize_docs", tokenize_docs_udtf())
