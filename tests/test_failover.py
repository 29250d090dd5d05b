"""Source-failover tests: primary/backup rotation for batch reads and
stream starts, mid-run restart-with-resume through a shared
checkpoint, and DNS-style endpoint-change detection — mirroring the
reference's SwitchByIP / SwitchByDNS master-failover behaviors
(binloginput.go:199-221, dnstracker.go) at the Spark level."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from pipe_s_spark.sources.failover import (
    EndpointChangeTracker,
    FailoverSource,
    SourceUnavailableError,
    start_stream_with_failover,
    supervise_stream_with_failover,
)


def _write_parquet(spark, path, n=10):
    spark.range(n).withColumn("v", F.col("id") * 2).write.parquet(path)


def test_failover_source_uses_first_healthy_endpoint(spark, tmp_path):
    good = str(tmp_path / "replica")
    _write_parquet(spark, good)
    src = FailoverSource(
        [str(tmp_path / "dead_primary"), good],
        reader=lambda s, ep: s.read.parquet(ep),
    )
    df = src.read(spark)
    assert df.count() == 10
    assert src.active_endpoint == good


def test_failover_source_all_dead_reports_every_attempt(spark, tmp_path):
    src = FailoverSource(
        [str(tmp_path / "a"), str(tmp_path / "b")],
        reader=lambda s, ep: s.read.parquet(ep),
    )
    with pytest.raises(SourceUnavailableError) as ei:
        src.read(spark)
    assert len(ei.value.attempts) == 2
    assert src.active_endpoint is None


def test_failover_probe_catches_lazily_failing_endpoint(spark, tmp_path):
    """A reader that BUILDS fine but fails on execution (dead server
    behind a valid URL) must fail over at read() time, not downstream."""
    good = str(tmp_path / "g")
    _write_parquet(spark, good)

    def reader(s, ep):
        if ep == "lazy-dead":
            # builds a valid plan whose execution raises
            return s.range(1).select(F.expr("raise_error('connection lost')"))
        return s.read.parquet(ep)

    src = FailoverSource(["lazy-dead", good], reader=reader)
    assert src.read(spark).count() == 10
    assert src.active_endpoint == good


def _stream_rows(spark, src_dir, out_dir, ckpt, rows_file, rows):
    os.makedirs(src_dir, exist_ok=True)
    with open(os.path.join(src_dir, rows_file), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_stream_start_failover_and_checkpoint_resume(spark, tmp_path):
    """Start failover: the primary raises at start, the backup serves;
    a second run against the SAME checkpoint from the backup resumes
    instead of reprocessing (the reference's resume-from-state-store
    story, played by the Structured Streaming checkpoint)."""
    backup = str(tmp_path / "backup_src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _stream_rows(spark, backup, out, ckpt, "f1.json", [{"pk": i, "v": i} for i in range(5)])

    def start(ep):
        q = (
            spark.readStream.schema("pk long, v long")
            .json(ep)  # missing dir -> AnalysisException at start
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        return q

    q, ep = start_stream_with_failover([str(tmp_path / "dead_primary"), backup], start)
    q.awaitTermination(60)
    assert ep == backup
    assert spark.read.parquet(out).count() == 5

    # new file arrives; restart (same checkpoint) must deliver ONLY it
    _stream_rows(spark, backup, out, ckpt, "f2.json", [{"pk": 5, "v": 5}])
    q2, ep2 = start_stream_with_failover([backup], start)
    q2.awaitTermination(60)
    got = {r["pk"] for r in spark.read.parquet(out).collect()}
    assert got == set(range(6)), "resume delivered the delta exactly once"


def test_supervise_rotates_endpoint_after_midrun_failure(spark, tmp_path):
    """A query that starts and then DIES must be restarted against the
    next endpoint; the run completes there."""
    good = str(tmp_path / "good_src")
    out = str(tmp_path / "o2")
    ckpt = str(tmp_path / "c2")
    _stream_rows(spark, good, out, ckpt, "f1.json", [{"pk": 1, "v": 1}])

    class DyingQuery:
        def awaitTermination(self, *_):
            raise RuntimeError("connection reset mid-run")

    def start(ep):
        if ep == "flaky":
            return DyingQuery()
        return (
            spark.readStream.schema("pk long, v long")
            .json(ep)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    ep = supervise_stream_with_failover(["flaky", good], start, max_restarts=2, await_timeout_s=60)
    assert ep == good
    assert spark.read.parquet(out).count() == 1


def test_endpoint_change_tracker_detects_once_and_tolerates_errors():
    fired = []
    resolutions = [["10.0.0.1", "10.0.0.2"]]

    def resolve():
        if resolutions[0] is None:
            raise OSError("dns timeout")
        return resolutions[0]

    t = EndpointChangeTracker(resolve, on_change=lambda old, new: fired.append((old, new)))
    assert t.poll() is False  # first resolution seeds the baseline
    assert t.poll() is False  # unchanged
    resolutions[0] = ["10.0.0.2", "10.0.0.1"]
    assert t.poll() is False, "order-insensitive compare (sorted dedup)"
    resolutions[0] = None
    assert t.poll() is False, "resolution failure is not a change"
    resolutions[0] = ["10.0.0.9"]
    assert t.poll() is True
    assert fired == [(["10.0.0.1", "10.0.0.2"], ["10.0.0.9"])]
    assert t.poll() is False, "fires once per change"
