"""The committed full-surface correctness artifact must track the live
query registry: the r7 verdict's core ask was converting claimed-green
into AUDITABLE-green for the whole surface, which only holds if the
artifact is regenerated whenever the surface changes. Adding a query
without re-running `python tools/local_correctness.py` fails here —
deliberate friction."""

from __future__ import annotations

import json


def test_correctness_artifact_matches_registry():
    with open("/root/repo/CORRECTNESS_LOCAL.json") as f:
        data = json.load(f)
    meta = data.pop("_meta")
    from pipe_s_spark.registry import all_queries

    registry = set(all_queries())
    artifact = set(data)
    missing = registry - artifact
    stale = artifact - registry
    assert not missing, (
        f"queries with no artifact row (re-run tools/local_correctness.py): {sorted(missing)}"
    )
    assert not stale, f"artifact rows for unregistered queries: {sorted(stale)}"
    assert meta["bad"] == 0, f"committed artifact records failures: {meta}"
    assert meta["queries"] == len(registry)


def test_correctness_artifact_rows_are_green():
    with open("/root/repo/CORRECTNESS_LOCAL.json") as f:
        data = json.load(f)
    data.pop("_meta")
    def green(row: dict) -> bool:
        if row["hash_match"] is None:
            # rows-only check (no oracle registered): green = it ran
            return row["err"] is None and row["spark_rows"] is not None
        return bool(row["rows_match"] and row["schema_match"] and row["hash_match"])

    bad = {name for name, row in data.items() if not green(row)}
    assert not bad, f"non-green artifact rows: {sorted(bad)}"


def test_rotating_artifact_is_fresh_and_recipe_true():
    """The r9/r10 briefs' rotating-sample mitigation only carries
    evidentiary weight if the committed artifact is (a) from THIS
    round, (b) green, and (c) exactly the sample the public recipe
    produces — a stale or hand-picked artifact must fail CI, not
    review. Round truth = the latest PROGRESS.jsonl row (the driver's
    own marker); the expected key set is recomputed from the live
    registry through the same rotating_sample() the tool uses, so a
    registry change without a re-run also fails here."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.rotating_correctness import default_sf_dir, rotating_sample

    with open("/root/repo/PROGRESS.jsonl") as f:
        rounds = [json.loads(ln)["round"] for ln in f if ln.strip()]
    current_round = rounds[-1]

    with open("/root/repo/CORRECTNESS_ROTATING.json") as f:
        art = json.load(f)
    meta = art["_meta"]
    assert meta["round"] == current_round, (
        f"rotating artifact is from round {meta['round']}, driver is on "
        f"{current_round} — re-run: python tools/rotating_correctness.py "
        f"{current_round}"
    )
    assert meta["bad"] == 0, f"rotating artifact records failures: {meta}"
    assert meta["sf_dir"] == default_sf_dir(current_round), (
        "rotating artifact scale violates the parity rule "
        f"(want {default_sf_dir(current_round)}, got {meta['sf_dir']})"
    )

    from pipe_s_spark.registry import all_queries

    want = set(rotating_sample(all_queries(), current_round, meta["size"]))
    got = set(art["results"])
    assert got == want, (
        f"artifact keys are not the recipe sample: missing={sorted(want - got)} "
        f"extra={sorted(got - want)}"
    )


def test_coverage_ledger_tracks_rotating_artifact():
    """The r12 recipe ranks NEVER-SAMPLED keys first, which is only
    replayable if the committed COVERAGE_SAMPLED.json ledger (a) is
    internally consistent (strictly-before semantics mean this round's
    own entries never influence this round's draw), (b) contains every
    key the committed rotating artifact drew, and (c) only names
    registered queries. A green rotating run must also have folded its
    draw into the ledger — forgetting that silently degrades the next
    round's bias back to pure rotation."""
    from tools.rotating_correctness import covered_before

    with open("/root/repo/COVERAGE_SAMPLED.json") as f:
        ledger = json.load(f)["first_sampled"]
    with open("/root/repo/CORRECTNESS_ROTATING.json") as f:
        art = json.load(f)
    rnd = art["_meta"]["round"]
    from pipe_s_spark.registry import all_queries

    registry = set(all_queries())
    unknown = set(ledger) - registry
    assert not unknown, f"ledger rows for unregistered queries: {sorted(unknown)}"
    missing = set(art["results"]) - set(ledger)
    assert not missing, (
        f"rotating draws absent from the coverage ledger: {sorted(missing)}"
    )
    # the artifact's recorded never-sampled count must match a replay
    # against the committed ledger (strictly-before covered set)
    cov = covered_before(rnd)
    replay = sum(1 for n in art["results"] if n not in cov)
    assert art["_meta"].get("never_sampled_drawn") == replay
