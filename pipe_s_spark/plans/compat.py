"""Reference-config compatibility: translate the reference engine's
own Task JSON (`/root/reference/examples/configsamples/*.json`,
`pkg/task/task.go:119-165`) into a runner spec, so a reference user's
existing config files run on this engine unchanged.

Network-backed endpoints are replaced by the repo's documented
stand-ins (no MySQL/Kafka broker in the environment — SURVEY §1.2):

- ``MysqlBinlogInput`` / ``MysqlScanInput`` / ``KafkaInput`` -> the
  deterministic changelog derivation over the events table (the same
  stand-in every `cdc_*` oracle query uses). With real endpoints,
  `sources/readers.py` (partitioned JDBC) and `sources/kafka.py`
  (envelope decode) are the production paths.
- ``MysqlStreamOutput`` / ``MysqlBatchOutput`` -> compacted parquet
  upsert staging (the JDBC upsert sink `sinks/jdbc_upsert.py` is the
  env-gated production path).
- ``KafkaOutput`` -> JSONL frame export (`sinks/kafka.py` shapes real
  frames when a broker exists).
- ``MysqlCheckOutput`` -> noop sink (the check operator itself is
  `operators/checker.py`, exercised by the `cdc_check` oracle query).

Every substitution is recorded in the returned ``notes`` list so a
translation is never silently lossy. Processor translations are
1:1 — the reference's processor algebra is fully implemented
(`ARCHITECTURE.md` §3).
"""

from __future__ import annotations

import re
from collections.abc import Mapping
from typing import Any


class CompatError(ValueError):
    pass


def _snake(name: str) -> str:
    return re.sub(r"(?<!^)(?=[A-Z])", "_", name).lower()


def translate_reference_config(
    ref: Mapping[str, Any],
    sf_dir: str = "/root/testdata/sf0.001",
    out_dir: str = "/tmp/pipe_s_out/compat",
) -> tuple[dict, list[str]]:
    """Return (runner_spec, notes). ``ref`` is the parsed reference
    Task JSON; ``sf_dir`` feeds the stand-in changelog; sinks write
    under ``out_dir``."""
    task = ref.get("Task")
    if not isinstance(task, Mapping):
        raise CompatError("not a reference config: missing top-level 'Task'")
    pipe = task.get("Pipeline", {})
    notes: list[str] = []
    if task.get("StateStore"):
        notes.append(
            "StateStore -> Structured Streaming checkpoints / streaming.merge_apply "
            "epoch fence (batch translation runs stateless)"
        )
    if pipe.get("Type") == "DisruptorPipeline":
        notes.append(
            "DisruptorPipeline concurrency -> Spark task scheduling (SURVEY §2.4)"
        )

    spec: dict[str, Any] = {
        "Input": {"Type": "parquet", "Config": {"sfDir": sf_dir, "table": "events"}},
        "Processors": [],
        "Output": {"Type": "console", "Config": {"numRows": 5}},
    }

    in_type = pipe.get("Input", {}).get("Type")
    if in_type in ("MysqlBinlogInput", "MysqlScanInput", "KafkaInput", "MySQLInput"):
        spec["Processors"].append({"Type": "changelog-from-events"})
        notes.append(f"{in_type} -> deterministic changelog stand-in over events")
        # the reference samples are written against their integration
        # DB namespace; alias the stand-in's 'app' db into it so the
        # configs' own table patterns select real rows
        spec["Processors"].append(
            {"Type": "map-names", "Config": {"dbMap": {"app": "pipes_test_db"}}}
        )
        notes.append("stand-in db 'app' aliased to 'pipes_test_db'")
    elif in_type is not None:
        raise CompatError(f"unknown reference input type: {in_type!r}")

    _translate_processors(pipe.get("Processors", []) or [], spec["Processors"], notes)

    out_type = pipe.get("Output", {}).get("Type")
    task_id = task.get("ID", "task")
    spec["Output"] = _translate_output(
        pipe.get("Output", {}), task_id, out_dir, spec["Processors"], notes
    )
    return spec, notes


def _translate_processors(
    procs, out: list[dict], notes: list[str]
) -> None:
    for p in procs:
        t = p.get("Type")
        if t == "MysqlDMLFilter":
            cfg: dict[str, Any] = {}
            if "FullTableNamePattern" in p:
                cfg["fullNameRegex"] = p["FullTableNamePattern"]
            out.append({"Type": "dml-filter", "Config": cfg})
        elif t == "MysqlDMLToDBChangeConverter":
            notes.append(
                "MysqlDMLToDBChangeConverter -> no-op: the changelog stand-in is "
                "already DBChange-shaped (operators/converter.py is the real path)"
            )
        elif t == "DBChangeUnmarshaller":
            notes.append(
                "DBChangeUnmarshaller -> no-op: stand-in rows arrive decoded "
                "(runner 'json-unmarshal' is the real path)"
            )
        elif t == "DBTableNameCatcher":
            out.append(
                {
                    "Type": "catch-table-name",
                    "Config": {
                        "pattern": p["TableNamePattern"],
                        "outCol": _snake(p.get("TableNameVariable", "logical_table")),
                    },
                }
            )
        elif t == "ColumnValueProcessor":
            mappings = p.get("TableColumnMappings", {})
            col = next(iter(mappings.values()), "pk")
            if col not in ("pk", "k", "value", "seq", "id"):
                notes.append(
                    f"ColumnValueProcessor column {col!r} -> 'pk' (stand-in schema)"
                )
                col = "pk"
            out.append(
                {
                    "Type": "column-value",
                    "Config": {
                        "column": col,
                        "outCol": _snake(p.get("OutputVariable", "partition_key")),
                    },
                }
            )
        elif t == "ValueMapper":
            out.append(
                {
                    "Type": "value-map",
                    "Config": {
                        "mapping": p["Mappings"],
                        "inCol": _snake(p["InputVariable"]),
                        "outCol": _snake(p["OutputVariable"]),
                    },
                }
            )
        elif t == "DBChangeMappingProcessor":
            db_map = {
                m["Source"]["DB"]: m["Target"].get("DB", m["Source"]["DB"])
                for m in p.get("Mappings", [])
                if "DB" in m.get("Source", {})
            }
            out.append(
                {"Type": "map-names", "Config": {"dbMap": db_map}}
            )
        elif t == "JsonMarshaller":
            out.append({"Type": "json-marshal"})
        elif t == "MySQLEventToDBEvent":
            notes.append(
                "MySQLEventToDBEvent -> no-op: the changelog stand-in is "
                "already DBChange-shaped"
            )
        elif t == "SetVariable":
            # reference semantics: bind a message attribute to a named
            # variable; FullTableName = db + '.' + table
            if p.get("InputType") == "FullTableName":
                out.append(
                    {
                        "Type": "sql",
                        "Config": {
                            "query": "SELECT *, db || '.' || table_name AS "
                            + _snake(p.get("OutputVariable", "full_table_name"))
                            + " FROM __input__"
                        },
                    }
                )
            else:
                raise CompatError(
                    f"SetVariable InputType {p.get('InputType')!r} not translatable"
                )
        else:
            raise CompatError(f"unknown reference processor type: {t!r}")


def _translate_output(
    out_spec, task_id: str, out_dir: str, procs: list[dict], notes: list[str]
) -> dict:
    out_type = out_spec.get("Type")
    if out_type in ("MysqlStreamOutput", "MysqlBatchOutput"):
        notes.append(
            f"{out_type} -> fenced bucketed merge target (compaction + "
            "idempotent upsert apply, streaming.merge_apply; "
            "sinks/jdbc_upsert.py is the env-gated JDBC path)"
        )
        return {
            "Type": "merge",
            "Config": {"path": f"{out_dir}/{task_id}_merge_target"},
        }
    if out_type == "KafkaOutput":
        notes.append("KafkaOutput -> JSONL frame export (sinks/kafka.py with a broker)")
        return {
            "Type": "jsonl",
            "Config": {"path": f"{out_dir}/{task_id}_frames", "numFiles": 1},
        }
    if out_type == "MysqlCheckOutput":
        notes.append(
            "MysqlCheckOutput -> noop (no target DB in env; with a parquet "
            "target use the runner's 'check' output, which runs "
            "operators/checker.py and writes the diff report)"
        )
        return {"Type": "noop"}
    if out_type == "LogOutput":
        return {"Type": "console", "Config": {"numRows": 5}}
    if out_type == "DebugOutput":
        return {"Type": "debug", "Config": {"where": "pk < 3", "numRows": 5}}
    if out_type == "DummyOutput":
        return {"Type": "noop"}
    if out_type == "ForkPipeline":
        # the reference's aspirational fork (componentbuilder.go:76-124,
        # never implemented there) -> the runner's working fork output
        branches = []
        for i, b in enumerate(out_spec.get("Outputs", [])):
            b_procs: list[dict] = []
            _translate_processors(b.get("Processors", []) or [], b_procs, notes)
            b_out = _translate_output(
                b.get("Output", {}), f"{task_id}_fork{i}", out_dir, b_procs, notes
            )
            branches.append({"Processors": b_procs, "Output": b_out})
        notes.append("ForkPipeline -> runner fork output (implemented here)")
        return {"Type": "fork", "Outputs": branches}
    raise CompatError(f"unknown reference output type: {out_type!r}")
