"""Custom stateful streaming operators via applyInPandasWithState.

The reference's only stateful construct is the per-window batch
compactor (held in process memory, lost on crash, reconstructed by
replay). Structured Streaming's state store upgrades this: keyed state
survives restarts via the checkpoint. Two operators:

- ``streaming_dedup``: emit each key's row only the first time it is
  seen (exact dedup across the whole stream — the streaming counterpart
  of the batch dedup_exact query). State = one flag per key; at 100 TB
  use the RocksDB state store provider + watermark-scoped state TTL.

- ``streaming_last_state``: running per-key latest-row view (the
  always-fresh form of changelog compaction): emits the new latest row
  whenever a key's max-seq row changes.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen = state.exists
    if not seen:
        first = None
        for pdf in pdfs:
            if len(pdf) and first is None:
                first = pdf.iloc[[0]]
        if first is not None:
            state.update((1,))
            yield first
    else:
        for _ in pdfs:
            pass


def streaming_dedup(
    grouped_key_cols: list[str],
    output_schema: str,
) -> tuple:
    """Return (func, outputStructType-str, stateStructType-str, mode,
    timeout) args for ``df.groupBy(...).applyInPandasWithState``."""
    return (
        _dedup_fn,
        output_schema,
        "seen int",
        "append",
        GroupStateTimeout.NoTimeout,
    )


def apply_streaming_dedup(stream: DataFrame, key_cols: list[str]) -> DataFrame:
    """First-occurrence-wins streaming dedup on key_cols."""
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in stream.schema.fields)
    fn, out_schema, state_schema, mode, timeout = streaming_dedup(key_cols, schema)
    return stream.groupBy(*key_cols).applyInPandasWithState(
        fn, out_schema, state_schema, mode, timeout
    )


def _last_state_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    best: pd.DataFrame | None = None
    best_seq: Any = state.get[0] if state.exists else None
    for pdf in pdfs:
        if not len(pdf):
            continue
        top = pdf.sort_values("seq").iloc[[-1]]
        if best_seq is None or int(top["seq"].iloc[0]) > int(best_seq):
            best = top
            best_seq = int(top["seq"].iloc[0])
    if best is not None:
        state.update((int(best_seq),))
        yield best


def apply_streaming_last_state(stream: DataFrame, key_cols: list[str]) -> DataFrame:
    """Emit the new per-key latest row whenever it advances (requires a
    ``seq`` column; the streaming view of changelog compaction)."""
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in stream.schema.fields)
    return stream.groupBy(*key_cols).applyInPandasWithState(
        _last_state_fn, schema, "last_seq long", "append", GroupStateTimeout.NoTimeout
    )
