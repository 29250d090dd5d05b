"""pipe_s_spark — a PySpark-native change-data + analytics engine.

A from-scratch rebuild of the capabilities of singular-seal/pipe-s
(a Go CDC replication pipeline) on top of Apache Spark:

- the canonical change-event data model (``pipe_s_spark.model``),
- the per-row transform algebra as composable DataFrame functions
  (``pipe_s_spark.operators``) — filter, convert, name/action mapping,
  value extraction, JSON marshalling,
- changelog compaction + merge-apply (``operators.compaction``) — the
  reference's batch-sink semantics (pkg/output/mysql/batch) re-expressed
  as pure DataFrame logic,
- snapshot scan + consistency check (``sources``, ``operators.checker``),
- streaming ingestion/apply with checkpointed exactly-once effects
  (``pipe_s_spark.streaming``),
- large-scale training-data-pipeline extensions: dedup, similarity
  search, text analysis, multimodal plumbing (``pipe_s_spark.functions``),
- a JSON pipeline-config runner mirroring the reference's declarative
  composition (``pipe_s_spark.plans``).

Everything is expressed DataFrame-first so Catalyst plans the physical
execution (pushdown, pruning, broadcast, AQE); Python UDFs appear only
where semantics genuinely require them, always Arrow-vectorized.
"""

__version__ = "0.3.0"
