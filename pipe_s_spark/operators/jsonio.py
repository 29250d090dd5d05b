"""JSON (de)serialization of change events.

Parity: ``JsonMarshaller`` (/root/reference/pkg/processor/json/
marshaller.go:18-24) and ``DBChangeUnmarshaller`` (json/
unmarshaller.go:19-31). Spark: ``to_json(struct(...))`` /
``from_json`` — JVM-side, codegen'd, no Python involved.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def marshal_json(
    cols: Sequence[str] | None = None,
    out_col: str = "value",
) -> Callable[[DataFrame], DataFrame]:
    """Serialize selected columns (default: all) into one JSON string
    column — the wire format for Kafka-bound events."""

    def _apply(df: DataFrame) -> DataFrame:
        use = list(cols) if cols is not None else df.columns
        return df.withColumn(out_col, F.to_json(F.struct(*[F.col(c) for c in use])))

    return _apply


def unmarshal_json(
    schema: T.StructType | str,
    in_col: str = "value",
    flatten: bool = True,
) -> Callable[[DataFrame], DataFrame]:
    """Parse a JSON string column back into typed columns."""

    def _apply(df: DataFrame) -> DataFrame:
        parsed = df.withColumn("__parsed", F.from_json(F.col(in_col).cast("string"), schema))
        if flatten:
            keep = [c for c in df.columns if c not in (in_col, "__parsed")]
            return parsed.select(*keep, F.col("__parsed.*"))
        # drop the raw string first — otherwise two columns share in_col's
        # name and later references are ambiguous
        return parsed.drop(in_col).withColumnRenamed("__parsed", in_col)

    return _apply
