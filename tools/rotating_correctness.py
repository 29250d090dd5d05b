"""Per-round ROTATING correctness sample — a committed artifact whose
query subset changes every round by a seed the judge can replay.

Why it exists: the driver's own ~50-query gate sample has re-drawn the
SAME keys for several consecutive rounds, so its cumulative distinct
coverage stalled while the surface grew; the committed FULL sweeps
(tools/local_correctness.py -> CORRECTNESS_LOCAL*.json) cover
everything but are necessarily builder-run. This tool splits the
difference: the sample is a pure function of the ROUND NUMBER — no
builder discretion in what gets sampled — so a reviewer can re-run the
exact same subset with one command and diff the result.

Sample recipe (deterministic, documented in the artifact itself):
    partition the registry into NEVER-SAMPLED (no row in the committed
    COVERAGE_SAMPLED.json ledger with first_sampled.round < round) and
    already-covered keys, rank each partition by md5(f"r{round}:{name}"),
    concatenate never-sampled first, take the first ``size`` (default
    60). Pure md5 rotation resamples already-covered keys forever
    (r11 verdict: 70 of 215 never independently sampled after 11
    rounds); biasing the deterministic order toward the uncovered set
    closes cumulative coverage in ~2 rounds while staying replayable —
    the ledger is committed, entries carry the round they were first
    drawn in, and the covered set for round R is exactly the entries
    with round < R, so a replay after the ledger update still draws
    the identical sample.

The default scale ALTERNATES by round parity (default_sf_dir): even
rounds sweep sf0.01 (the driver gate's scale), odd rounds sf0.1 — so
across two rounds the rotation exercises both the value-hash grain and
the 10x data grain with zero builder discretion in either choice.

Usage: python tools/rotating_correctness.py <round> [size] [sf_dir]
Writes CORRECTNESS_ROTATING.json at the repo root.
tests/test_artifact_freshness.py pins the committed artifact to this
recipe: round must match PROGRESS.jsonl's latest round, the key set
must equal rotating_sample(all_queries(), round, size), and bad == 0.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

import __spark_entry__ as entrymod
from tests.oracle_harness import compare, duck_con

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(_ROOT, "CORRECTNESS_ROTATING.json")
LEDGER = os.path.join(_ROOT, "COVERAGE_SAMPLED.json")


def covered_before(round_no: int) -> set[str]:
    """Keys independently sampled (driver gate or rotating artifact)
    in any round BEFORE ``round_no``, per the committed ledger. The
    strict inequality makes the recipe replayable after the ledger is
    updated with this round's own draws."""
    try:
        with open(LEDGER) as f:
            ledger = json.load(f)
    except FileNotFoundError:
        return set()
    return {
        name
        for name, row in ledger["first_sampled"].items()
        if row["round"] < round_no
    }


def rotating_sample(names, round_no: int, size: int) -> list[str]:
    """NEVER-SAMPLED keys first (per COVERAGE_SAMPLED.json), each
    partition ranked by md5("r{round}:{name}"), first ``size`` taken —
    stable for a round, biased toward unexplored coverage, replayable
    by anyone from the committed ledger."""
    cov = covered_before(round_no)

    def h(n: str) -> str:
        return hashlib.md5(f"r{round_no}:{n}".encode()).hexdigest()

    never = sorted((n for n in names if n not in cov), key=h)
    seen = sorted((n for n in names if n in cov), key=h)
    return (never + seen)[:size]


def update_ledger(sampled, round_no: int, source: str) -> None:
    """Record first-sample rounds for this draw. Existing entries are
    NEVER rewritten — not even by a replay claiming an earlier round
    (r12 advice: lowering an entry's first-sampled round retroactively
    changes covered_before() for intermediate rounds and breaks
    replayability of their committed samples). The ledger is an
    append-only history: first writer wins, replays of old rounds
    insert only names the ledger has never seen."""
    try:
        with open(LEDGER) as f:
            ledger = json.load(f)
    except FileNotFoundError:
        ledger = {"_meta": {}, "first_sampled": {}}
    fs = ledger["first_sampled"]
    for name in sampled:
        if name not in fs:
            fs[name] = {"round": round_no, "source": source}
    ledger["first_sampled"] = dict(sorted(fs.items()))
    with open(LEDGER, "w") as f:
        json.dump(ledger, f, indent=1)
        f.write("\n")


def default_sf_dir(round_no: int) -> str:
    """Even rounds sf0.01 (driver-gate scale), odd rounds sf0.1 —
    parity-determined so the scale choice is as builder-discretion-free
    as the sample itself."""
    return "/root/testdata/sf0.01" if round_no % 2 == 0 else "/root/testdata/sf0.1"


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit("usage: rotating_correctness.py <round> [size] [sf_dir]")
    round_no = int(sys.argv[1])
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else default_sf_dir(round_no)

    # vanilla session, like the driver gate (tools/local_correctness.py)
    spark = (
        SparkSession.builder.appName("rotating_correctness")
        .master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    sample = rotating_sample(queries.keys(), round_no, size)
    con = duck_con(sf_dir)
    rows: dict[str, dict] = {}
    t_start = time.time()
    bad = 0
    for name in sample:
        t0 = time.time()
        try:
            df = queries[name](spark, sf_dir)
            n = df.count()
            if name in oracles:
                compare(df, con, oracles[name])
                rows[name] = {"status": "pass", "rows": n}
            else:
                rows[name] = {"status": "rows-only", "rows": n}
        except Exception as e:  # noqa: BLE001
            bad += 1
            rows[name] = {
                "status": "FAIL",
                "err": f"{type(e).__name__}: {str(e)[:300]}",
            }
        print(f"{name:32s} {time.time() - t0:6.2f}s  {rows[name]['status']}", flush=True)
    out = {
        "_meta": {
            "round": round_no,
            "size": size,
            "sf_dir": sf_dir,
            "recipe": (
                "never-sampled-first (COVERAGE_SAMPLED.json, first_sampled."
                "round < round), each partition sorted by "
                "md5(f'r{round}:{name}'), first `size` taken — "
                f"replay: python tools/rotating_correctness.py {round_no} {size}"
            ),
            "never_sampled_drawn": sum(
                1 for n in sample if n not in covered_before(round_no)
            ),
            "pass": sum(1 for v in rows.values() if v["status"] == "pass"),
            "rows_only": sum(1 for v in rows.values() if v["status"] == "rows-only"),
            "bad": bad,
            "elapsed_sec": round(time.time() - t_start, 1),
        },
        "results": rows,
    }
    with open(ARTIFACT, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    if not bad:
        update_ledger(sample, round_no, "rotating")
    print(json.dumps({"round": round_no, "checked": len(rows), "bad": bad}))
    spark.stop()
    if bad:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
