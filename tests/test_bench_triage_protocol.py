"""Probe-normalized bench-triage protocol (r12 verdict #1).

BENCH_r12 demonstrated the failure mode: the driver's bench ran on a
host 35% slower than the committed artifact's (probe 0.146 -> 0.197),
20 untouched sim/sketch queries crossed the raw >30% threshold, and
the fresh-session re-measure — equally slowed, compared against an
unadjusted prior — marked every one `reproduced: true`. The protocol
now (a) scales the flag threshold by the probe ratio, (b) judges the
isolated median against the probe-scaled prior, and (c) refuses a
verdict outright when the isolated probe drifted >20% from the
committed one. These tests replay the EXACT r12 numbers (committed
quiet-host artifact at 60304c5, probe 0.1461; driver run probe 0.1967)
and assert the required outcome: zero `reproduced: true` entries on
untouched code.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from bench import is_regression, probe_ratio, triage_verdict

#: (name, prior_sec, main_sec, isolated_sec) from the r12 driver run's
#: committed triage block (git show 9970f58:BENCH_LOCAL.json) — every
#: row was marked reproduced:true by the old protocol and adjudicated
#: host drift by the judge (VERDICT r12, What's wrong #1).
R12_PRIOR_PROBE = 0.1461
R12_MAIN_PROBE = 0.1967
R12_ROWS = [
    ("sim_graph_recall", 0.8215, 5.2723, 2.2822),
    ("sim_ivf_nprobe_curve", 1.6702, 4.5330, 7.1412),
    ("sim_domain_drift", 1.0298, 2.6254, 1.5176),
    ("sim_centroid_confusion", 1.2742, 2.6687, 1.8608),
    ("sim_ivf_kmeans", 0.2924, 1.6305, 0.5879),
    ("sim_ivf_recall", 1.5194, 2.7056, 5.0343),
]


def test_r12_replay_produces_zero_reproduced_entries():
    """The verdict's done-criterion: the r12 scenario (committed
    quiet-host artifact, 35%-slower driver host) must yield NO
    `reproduced: true` on untouched code — the isolated probe drifted
    1.35x, so every verdict is indeterminate (None), never an
    authoritative true."""
    for name, prior, _main, iso in R12_ROWS:
        reproduced, reason = triage_verdict(
            prior, R12_PRIOR_PROBE, iso, R12_MAIN_PROBE
        )
        assert reproduced is None, (name, reproduced, reason)
        assert "indeterminate" in reason


def test_probe_scaled_flagging_drops_pure_host_drift():
    """A query exactly tracking whole-host drift (sec = prior x probe
    ratio) never flags; one 2x over the SCALED prior still does."""
    ratio = probe_ratio(R12_MAIN_PROBE, R12_PRIOR_PROBE)  # ~1.35
    assert 1.3 < ratio < 1.4
    assert not is_regression(1.0298 * ratio, 1.0298, ratio)
    assert is_regression(1.0298 * ratio * 2, 1.0298, ratio)


def test_verdict_on_stable_host_still_catches_real_regressions():
    """With probes matched (<20% drift) the protocol must still call a
    genuinely reproduced slowdown true, and a non-reproducing one
    false — normalization must not neuter detection."""
    rep, reason = triage_verdict(1.0, 0.15, 2.5, 0.155)  # 2.5x, host flat
    assert rep is True and "reproduced" in reason
    rep, _ = triage_verdict(1.0, 0.15, 1.05, 0.155)  # recovered in isolation
    assert rep is False


def test_missing_probes_degrade_to_raw_threshold():
    """Artifacts predating the probe (or a failed probe) fall back to
    ratio 1.0 — the pre-r13 behavior — instead of crashing or
    suppressing every verdict."""
    assert probe_ratio(None, 0.15) == 1.0
    assert probe_ratio(0.15, None) == 1.0
    rep, _ = triage_verdict(1.0, None, 2.5, 0.15)
    assert rep is True
