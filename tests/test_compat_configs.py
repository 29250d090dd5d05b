"""plans.compat: every one of the reference engine's shipped config
samples (`examples/configsamples/*.json`) must translate and RUN
through the runner — with each endpoint substitution explicitly noted,
never silent."""

from __future__ import annotations

import glob
import json
import os

import pytest

from pipe_s_spark.plans import run_pipeline
from pipe_s_spark.plans.compat import CompatError, translate_reference_config

REF_SAMPLES = sorted(
    glob.glob("/root/reference/examples/configsamples/*.json")
    + glob.glob("/root/reference/integration_test/*/*.json")
)


def test_all_reference_samples_present():
    # 8 shipped examples + 5 integration-test configs
    assert len(REF_SAMPLES) == 13


@pytest.mark.parametrize("path", REF_SAMPLES, ids=[p.rsplit("/", 2)[-2] + "/" + os.path.basename(p) for p in REF_SAMPLES])
def test_reference_config_translates_and_runs(spark, path, tmp_path):
    ref = json.load(open(path))
    spec, notes = translate_reference_config(ref, out_dir=str(tmp_path))
    assert all(isinstance(n, str) and n for n in notes)
    # network inputs always get the documented stand-in note
    assert any("stand-in" in n for n in notes)
    run_pipeline(spark, spec)
    # sink-producing configs must actually land rows
    out = spec["Output"]
    if out["Type"] in ("parquet",):
        assert spark.read.parquet(out["Config"]["path"]).count() > 0
    if out["Type"] == "merge":
        from pipe_s_spark.streaming.merge_apply import MergeApplyTarget

        tgt = MergeApplyTarget(out["Config"]["path"])
        assert tgt.read_current(spark).count() > 0
    if out["Type"] == "jsonl":
        assert spark.read.json(out["Config"]["path"]).count() > 0


def test_filter_semantics_match_reference_full_name(spark):
    """FullTableNamePattern matches db.table (mysqldml.go:50-63): a
    pattern anchored on the db name must keep rows whose table alone
    would not match."""
    ref = {
        "Task": {
            "ID": "t",
            "Pipeline": {
                "Input": {"Type": "MysqlBinlogInput"},
                "Processors": [
                    {"Type": "MysqlDMLFilter", "FullTableNamePattern": "^pipes_test_db\\.sbtest[12]$"}
                ],
                "Output": {"Type": "DummyOutput"},
            },
        }
    }
    spec, _ = translate_reference_config(ref)
    spec["Output"] = {"Type": "return"}
    df = run_pipeline(spark, spec)
    tables = {r["table_name"] for r in df.select("table_name").distinct().collect()}
    assert tables == {"sbtest1", "sbtest2"}


def test_unknown_component_is_loud():
    with pytest.raises(CompatError):
        translate_reference_config(
            {"Task": {"Pipeline": {"Input": {"Type": "NotAThing"}}}}
        )
