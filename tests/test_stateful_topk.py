"""Kernel-level tests for the transformWithState top-k processor
(the streaming e2e in test_streaming.py is env-gated on protobuf;
these exercise the merge logic directly)."""

from __future__ import annotations

import pandas as pd

from pipe_s_spark.streaming.stateful import _TopKProcessor


class FakeState:
    def __init__(self):
        self.v = None

    def exists(self):
        return self.v is not None

    def get(self):
        return self.v

    def update(self, v):
        self.v = v


def _run(proc, key, pdf):
    return list(proc.handleInputRows(key, iter([pdf]), None))[-1]


def test_topk_merges_state_across_batches():
    p = _TopKProcessor("k", "id", "v", 3)
    p._state = FakeState()
    out1 = _run(p, ("a",), pd.DataFrame({"id": [1, 2, 3, 4], "v": [1.0, 9.0, 5.0, 5.0]}))
    # ties by value break toward smaller id
    assert out1["id"].tolist() == [2, 3, 4]
    assert out1["v"].tolist() == [9.0, 5.0, 5.0]
    out2 = _run(p, ("a",), pd.DataFrame({"id": [9], "v": [7.0]}))
    assert out2["id"].tolist() == [2, 9, 3]
    assert out2["v"].tolist() == [9.0, 7.0, 5.0]
    assert out2["rk"].tolist() == [1, 2, 3]
    # state holds exactly the k survivors
    assert p._state.get() == ([2, 9, 3], [9.0, 7.0, 5.0])


def test_topk_underfull_group_emits_all():
    p = _TopKProcessor("k", "id", "v", 5)
    p._state = FakeState()
    out = _run(p, ("b",), pd.DataFrame({"id": [10, 11], "v": [2.0, 1.0]}))
    assert out["id"].tolist() == [10, 11]
    assert out["k"].tolist() == ["b", "b"]
