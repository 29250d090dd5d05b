"""Local replica of the driver's correctness gate, run with a VANILLA
SparkSession (no pipe_s_spark.session confs) so environment-dependence
bugs surface here instead of in CORRECTNESS_r{N}.json.

Usage: python tools/local_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

import __spark_entry__ as entrymod
from tests.oracle_harness import compare, duck_con


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = (
        SparkSession.builder.appName("local_correctness")
        .master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duck_con(sf_dir)
    results: dict[str, str] = {}
    for name in sorted(queries):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = queries[name](spark, sf_dir)
            if name in oracles:
                compare(df, con, oracles[name])
                results[name] = "pass"
            else:
                n = df.count()
                results[name] = f"rows-only ({n})"
        except AssertionError as e:
            results[name] = f"MISMATCH: {e}"
        except Exception as e:  # noqa: BLE001
            results[name] = f"ERR: {type(e).__name__}: {str(e)[:300]}"
        print(f"{name:32s} {time.time() - t0:6.2f}s  {results[name][:160]}", flush=True)
    bad = {k: v for k, v in results.items() if v != "pass" and not v.startswith("rows-only")}
    print(json.dumps({"checked": len(results), "bad": len(bad)}))
    if bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
