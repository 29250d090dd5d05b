"""Per-phase attribution of the CDC merge leg's scaling exponent (r13
verdict #4: merge alpha_x10 = 0.82 is the worst CDC exponent; compact
is 0.58 — find which term grows superlinearly).

Replays EXACTLY the scaling harness's merge leg (tools/stream_bench.py:
one bulk apply_batch of an amplified changelog into an EMPTY 16-bucket
target) at a given row count, and reports:

1. the library's own phase telemetry for the real apply
   (MergeApplyTarget.LAST_APPLY_PROFILE: compact / write / swap), and
2. a within-session decomposition of the WRITE phase on the identical
   localCheckpointed input — the host-noise protocol's
   "same session, same materialized input, alternate plans" form:
     - ``merge_noop``      : full merge plan -> noop sink
                             (compaction + anti-join + union compute,
                             zero file cost)
     - ``merge_parquet``   : same plan -> plain parquet
                             (+ columnar encode + file IO)
     - ``merge_partitioned``: same plan -> partitionBy("bucket")
                             (+ the dynamic-partition local sort and
                             per-task fan-out to <=num_buckets files —
                             the staged write apply_batch actually does)
   Each variant runs twice interleaved (A B A B) and reports the min,
   so a host burst mid-experiment poisons at most one reading.
3. a steady-state epoch (1% of keys updated) so rewrite amplification
   of bucket-grain upsert is visible next to the bulk numbers.

Run via tools/merge_scaling_attrib.py for the x1-vs-x10 comparison
(subprocess per amplification, like tools/stream_scaling.py).

Usage: python tools/merge_phase_profile.py [rows]  -> one JSON line
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    from pipe_s_spark.model import changelog_from_events
    from pipe_s_spark.operators.compaction import compact_changelog, merge_apply
    from pipe_s_spark.session import get_spark
    from pipe_s_spark.sizing import bulk_partitions
    from pipe_s_spark.streaming.merge_apply import MergeApplyTarget

    target_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="merge_phase_profile")
    spark.sparkContext.setLogLevel("ERROR")

    # identical machine probes to bench.py / stream_bench.py
    def _probe() -> float:
        t0 = time.time()
        spark.range(50_000_000).selectExpr("sum(id * 3 + 1) as s").write.format(
            "noop"
        ).mode("overwrite").save()
        return time.time() - t0

    _probe()
    probe_sec = round(min(_probe() for _ in range(3)), 4)

    def _probe_shuffle() -> float:
        t0 = time.time()
        spark.range(8_000_000).selectExpr("id % 1000000 as k", "id as v").groupBy(
            "k"
        ).agg({"v": "sum"}).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    _probe_shuffle()
    probe_shuffle_sec = round(min(_probe_shuffle() for _ in range(3)), 4)

    # identical amplified-changelog construction to stream_bench.py
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_events = events.count()
    amplify = max(1, target_rows // n_events)
    log = (
        changelog_from_events(events)
        .crossJoin(F.broadcast(spark.range(amplify).select(F.col("id").alias("rep"))))
        .withColumn("seq", F.col("seq") * amplify + F.col("rep"))
        .withColumn("pk", F.col("pk") + F.col("rep") * 1000)
        .drop("rep")
    )
    n_parts = bulk_partitions(log) or int(spark.sparkContext.defaultParallelism)
    log = log.repartition(n_parts).localCheckpoint()
    n_rows = log.count()

    tmp = tempfile.mkdtemp(prefix="merge_phase_")
    out: dict = {
        "rows": n_rows,
        "input_partitions": n_parts,
        "probe_sec": probe_sec,
        "probe_shuffle_sec": probe_shuffle_sec,
    }
    try:
        # --- 1. the real leg, with the library's phase telemetry -----
        tgt = MergeApplyTarget(f"{tmp}/target")
        t0 = time.time()
        tgt.apply_batch(log, epoch_id=1)
        out["apply_sec"] = round(time.time() - t0, 2)
        out["phases"] = {
            k: round(v, 2) if isinstance(v, float) else v
            for k, v in MergeApplyTarget.LAST_APPLY_PROFILE.items()
        }
        # same apply again, fresh target, same session/input: separates
        # the OPERATOR's cost from first-run session state (JIT, page
        # cache, block-manager shape) — if this is much faster, the
        # scaling harness's single-apply-per-session alpha is measuring
        # warmup, not the merge
        tgt2 = MergeApplyTarget(f"{tmp}/target2")
        t0 = time.time()
        tgt2.apply_batch(log, epoch_id=1)
        out["apply_warm_sec"] = round(time.time() - t0, 2)
        out["phases_warm"] = {
            k: round(v, 2) if isinstance(v, float) else v
            for k, v in MergeApplyTarget.LAST_APPLY_PROFILE.items()
        }

        # --- 3. steady-state epoch: ~1% of keys updated --------------
        upd = log.filter(F.pmod(F.col("pk"), F.lit(100)) == 0).withColumn(
            "seq", F.col("seq") + F.lit(10_000_000_000)
        ).withColumn("op", F.lit("update")).localCheckpoint()
        n_upd = upd.count()
        t0 = time.time()
        tgt.apply_batch(upd, epoch_id=2)
        out["steady_sec"] = round(time.time() - t0, 2)
        out["steady_rows"] = n_upd
        out["steady_phases"] = {
            k: round(v, 2) if isinstance(v, float) else v
            for k, v in MergeApplyTarget.LAST_APPLY_PROFILE.items()
        }

        # --- 2. write-phase decomposition, interleaved ---------------
        # identical merged plan apply_batch stages: compaction is
        # cached once (as apply_batch does), the three sinks alternate
        # over the same cache so only the sink differs.
        empty = MergeApplyTarget(f"{tmp}/empty_probe")
        compacted = compact_changelog(
            log, key_cols=("table_name", "pk"), payload_cols=["k", "value"]
        ).cache()
        t0 = time.time()
        compacted.select(
            F.pmod(F.hash("table_name", "pk"), F.lit(16)).alias("b")
        ).distinct().collect()
        cache_sec = round(time.time() - t0, 2)
        base = empty.read_current(spark)  # empty frame, batch-typed
        merged = merge_apply(
            base, compacted, ("table_name", "pk"), ("k", "value")
        ).withColumn("bucket", F.pmod(F.hash("table_name", "pk"), F.lit(16)))

        def run(kind: str) -> float:
            d = f"{tmp}/w_{kind}_{time.monotonic_ns()}"
            t0 = time.time()
            if kind == "merge_noop":
                merged.write.format("noop").mode("overwrite").save()
            elif kind == "merge_parquet":
                merged.write.mode("overwrite").parquet(d)
            else:  # merge_partitioned
                merged.write.mode("overwrite").partitionBy("bucket").parquet(d)
            dt = time.time() - t0
            shutil.rmtree(d, ignore_errors=True)
            return dt

        kinds = ["merge_noop", "merge_parquet", "merge_partitioned"]
        samples: dict[str, list[float]] = {k: [] for k in kinds}
        for _ in range(2):  # interleaved A B C A B C
            for k in kinds:
                samples[k].append(run(k))
        out["compact_cache_sec"] = cache_sec
        out["write_decomp"] = {k: round(min(v), 2) for k, v in samples.items()}
        compacted.unpersist()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
