#!/usr/bin/env python
"""Benchmark runner: executes the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop sink (no driver collect),
so timings include the full scan->shuffle->sink path the way a cluster
run would.

The JSON line is the LAST line of stdout and is also written to
BENCH_LOCAL.json: the driver tail-truncates captured output, and the
r2/r3 artifacts lost their head (and the parsed total) to Spark
console-progress noise — so progress bars are disabled and everything
else stays on stderr.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from pipe_s_spark.session import get_spark

    # progress bars write \r-framed noise to stdout and have twice cost
    # the driver-captured artifact its JSON head (BENCH_r02/r03)
    spark = get_spark(
        app_name="pipe_s_spark_bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    # warm the JVM, codegen, and parquet footers so per-query timings
    # measure the queries, not session startup
    from pipe_s_spark.sources import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()

    # warm the Python UDF workers too (one per core) so the first
    # mapInPandas query measures the operator, not worker fork+import
    spark.range(256).repartition(int(spark.sparkContext.defaultParallelism)).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    # machine-state calibration probe: a fixed synthetic workload whose
    # cost is independent of the query surface. Two same-code bench
    # runs an hour apart have shown a SYSTEMATIC ~14% whole-run drift
    # (thermal / cache / background state) that per-query repeats
    # cannot remove; recording the probe time lets a reader separate
    # "the machine was slower" from "a query regressed" when comparing
    # artifacts across rounds.
    def _probe() -> float:
        t0 = time.perf_counter()
        spark.range(50_000_000).selectExpr("sum(id * 3 + 1) as s").write.format(
            "noop"
        ).mode("overwrite").save()
        return time.perf_counter() - t0

    _probe()  # warm
    probe_sec = round(min(_probe() for _ in range(3)), 4)

    # MEDIAN of post-warmup repeats per query (r7 verdict: min-of-3
    # totals still swung ±20% run-to-run, leaving real <1.4x
    # regressions unattributable). The first execution pays one-off
    # codegen/GC spikes unrelated to the plan (a 5-run r4 re-measure of
    # window_range_frame: [1.76, 0.64, 0.54, 0.43, 0.38] — even run 2
    # can be 1.7x steady state), so it is DISCARDED as warmup and the
    # reported figure is the median of the remaining runs — robust to
    # a single residual spike in either direction, unlike min (which
    # understates queries whose typical run is slow) or mean (which a
    # single GC pause drags). SPARK_GRAFT_BENCH_RUNS counts TOTAL
    # executions (default 4 = 1 warmup + median of 3).
    runs = max(2, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "4")))
    import statistics

    from pipe_s_spark.functions import shared as SH

    def _cache_key_names(keys) -> list[str]:
        # drop the applicationId head; keep a compact human label
        return sorted("/".join(str(p) for p in k[1:]) for k in keys)

    timings: dict[str, float] = {}
    # per-query shared-cache attribution (r8 verdict: a ×1.54 swing on
    # dedup_ensemble could not be attributed because the artifact did
    # not say whether the query PAID a signature/pair-table build or
    # got it memoized). built_warmup keys are invisible in the median
    # (the warmup run is discarded); built_timed keys are NOT — a
    # non-empty built_timed means the reported median includes a cache
    # build (e.g. FIFO eviction forced a rebuild) and is not
    # comparable to a memoized-state round. Attribution drains the
    # memo's BUILD-EVENT log rather than diffing live-key snapshots:
    # a key built in warmup, FIFO-evicted, then REBUILT during a timed
    # run is net-absent from a snapshot diff (r9 advice) but appears
    # twice in the event log.
    cache_attr: dict[str, dict[str, list[str]]] = {}
    SH.drain_build_log()  # discard table-warmup builds
    for name in sorted(qs):
        samples: list[float] = []
        built_warmup: list[str] = []
        for i in range(runs):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
            if i == 0:
                built_warmup = _cache_key_names(SH.drain_build_log())
        built_timed = _cache_key_names(SH.drain_build_log())
        if built_warmup or built_timed:
            cache_attr[name] = {
                "built_warmup": built_warmup,
                "built_timed": built_timed,
            }
        timings[name] = round(statistics.median(samples[1:]), 4)

    total = round(sum(timings.values()), 4)
    full = {
        "metric": "total_query_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "probe_sec": probe_sec,
        "cache_builds": cache_attr,
        "sf": sf,
    }
    # durable full-detail copy: the driver keeps only the last 2000
    # chars of stdout, and 81 query timings don't fit — BENCH_r02/r03
    # lost their JSON head (and the parsed total) exactly this way
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"), "w"
    ) as f:
        json.dump(full, f, indent=1)
        f.write("\n")
    # the printed line stays under the capture window: all required
    # keys, the most expensive queries inline (descending cost), full
    # detail in BENCH_LOCAL.json
    budget = int(os.environ.get("SPARK_GRAFT_BENCH_LINE_BYTES", "1800"))
    inline: dict[str, float] = {}
    line = ""
    for name in sorted(timings, key=timings.get, reverse=True):
        trial = dict(inline)
        trial[name] = timings[name]
        cand = json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": trial,
                "n_queries": len(timings),
                "queries_full": "BENCH_LOCAL.json",
                "probe_sec": probe_sec,
                "sf": sf,
            },
            separators=(",", ":"),
        )
        if len(cand) > budget:
            break
        inline = trial
        line = cand
    sys.stdout.flush()
    print(line, flush=True)
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
