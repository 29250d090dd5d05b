"""Capture `.explain("formatted")` output for registered queries to
``plans/r15/<query>_<suffix>.txt`` (the optimization-round evidence
files). One session for the whole batch.

Usage: python tools/capture_plans.py <suffix> <sf_dir> <outdir> <query> [query...]

Run from the repo whose plans you want: the BEFORE files come from a
git worktree of the prior round's commit (same tool, different
PYTHONPATH/cwd), the AFTER files from HEAD.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout


def main() -> int:
    suffix, sf_dir, outdir = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    os.makedirs(outdir, exist_ok=True)

    import __spark_entry__ as e
    from pipe_s_spark.session import get_spark

    spark = get_spark(
        app_name="capture_plans",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    for name in names:
        if name not in qs:
            print("unknown:", name, file=sys.stderr)
            continue
        buf = io.StringIO()
        try:
            with redirect_stdout(buf):
                qs[name](spark, sf_dir).explain("formatted")
        except Exception as ex:  # noqa: BLE001 — keep capturing the rest
            buf.write(f"\nEXPLAIN FAILED: {ex}\n")
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        print("wrote", name, file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
