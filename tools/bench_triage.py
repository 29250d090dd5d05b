"""Isolated re-measure of bench queries flagged as regressed — the
fresh-session half of bench.py's triage protocol (r11 verdict #1).

Two consecutive rounds burnt attribution effort on PHANTOM regressions:
single-session medians on this host swing up to 2x on untouched code
(r10: percentiles family; r11: 12 queries >30% slower while the machine
probe got FASTER), because session state (JVM heap shape, GC pressure
from earlier queries, codegen cache) drifts over a 215-query run.
A regression that is REAL — a plan change, a new shuffle — reproduces
in a fresh session; session-state noise does not.

This script is run by bench.py in a SUBPROCESS (own JVM, quiet host:
the parent session is stopped first) with the flagged query names, and
re-times each with the identical per-query protocol (1 discarded warmup
+ median of 3). It also measures the SAME machine-state probe bench.py
runs, so the caller can probe-normalize the isolated readings against
the committed artifact's — and refuse a reproduced/not-reproduced
verdict when this session's host state differs too much from the one
the prior was measured on (r12 verdict #1: the un-normalized protocol
marked 20 host-drift entries `reproduced: true`). Prints ONE JSON line
{name: sec, ..., "_probe_sec": sec}.

r16 (verdict #2): the caller may append ``--controls c1 c2 ...`` —
UNTOUCHED queries co-measured with the identical protocol and reported
under ``"_controls"``. The synthetic probes are blind to host states
that only hit real query machinery (the r15 driver capture spiked
untouched queries 4-6x while its probes were the fastest on record);
controls give the verdict a real-query drift signal.

Usage: python tools/bench_triage.py <sf_dir> <name> [name ...] [--controls c1 c2 ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    rest = sys.argv[2:]
    controls: list[str] = []
    if "--controls" in rest:
        i = rest.index("--controls")
        names, controls = rest[:i], rest[i + 1 :]
    else:
        names = rest

    from pipe_s_spark.session import get_spark

    spark = get_spark(
        app_name="bench_triage",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    # identical warmup to bench.py: parquet footers + python workers
    from pipe_s_spark.sources import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()
    spark.range(256).repartition(
        int(spark.sparkContext.defaultParallelism)
    ).mapInPandas(lambda it: it, schema="id long").write.format("noop").mode(
        "overwrite"
    ).save()

    # identical machine-state probe to bench.py's (fixed synthetic
    # workload, warm + min-of-3): the caller normalizes the isolated
    # medians by it before calling anything "reproduced"
    def _probe() -> float:
        t0 = time.perf_counter()
        spark.range(50_000_000).selectExpr("sum(id * 3 + 1) as s").write.format(
            "noop"
        ).mode("overwrite").save()
        return time.perf_counter() - t0

    _probe()  # warm
    probe_sec = round(min(_probe() for _ in range(3)), 4)

    # shuffle-flavored probe, identical to bench.py's (r13 — see the
    # note there): recorded so a future verdict pass can normalize
    # shuffle-heavy queries against the probe that actually co-moves
    # with them
    def _probe_shuffle() -> float:
        t0 = time.perf_counter()
        spark.range(8_000_000).selectExpr(
            "id % 1000000 as k", "id as v"
        ).groupBy("k").agg({"v": "sum"}).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    _probe_shuffle()  # warm
    probe_shuffle_sec = round(min(_probe_shuffle() for _ in range(3)), 4)

    runs = max(2, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "4")))
    out: dict[str, float] = {
        "_probe_sec": probe_sec,
        "_probe_shuffle_sec": probe_shuffle_sec,
    }
    def _measure(name: str) -> float:
        samples: list[float] = []
        for _ in range(runs):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        return round(statistics.median(samples[1:]), 4)

    for name in names:
        out[name] = _measure(name)
    if controls:
        out["_controls"] = {c: _measure(c) for c in controls if c in qs}
    spark.stop()
    sys.stdout.flush()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
