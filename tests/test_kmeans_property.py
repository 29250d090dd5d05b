"""Property test: the distributed int64 k-means trainer
(functions.similarity.kmeans_train_int) must agree EXACTLY — every
centroid component — with a pure-Python referee on random small
corpora. The oracle parity run (sim_ivf_kmeans) checks one fixed
corpus; this exercises the adversarial corners that corpus misses:
negative per-cell sums (truncating division direction), cells that
lose all members mid-training, argmax ties, and sub-normal-ish values
near the quantization boundary."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest

from pipe_s_spark.functions import similarity as S

DIM = 8
N_CELLS = 4
QUANT = 1_000_000


def _init_centroid(cell: int) -> list[float]:
    # mirror functions.similarity.ivf_centroid at DIM dims
    raw = [
        int(hashlib.md5(f"c{cell}d{i}".encode()).hexdigest()[:4], 16) / 65536.0 - 0.5
        for i in range(1, DIM + 1)
    ]
    n = math.sqrt(sum(x * x for x in raw))
    return [x / n for x in raw]


def _ref_train(vecs: list[list[float]], iters: int) -> dict[int, list[int]]:
    """Pure-Python referee implementing the identical algorithm:
    double-argmax init over the md5 centroids (same IEEE op order as
    the Spark fold), then integer means + integer-dot reassignment."""

    def quantize(v):
        out = []
        for x in v:
            s = x * QUANT  # identical double multiply on both engines
            q = math.floor(abs(s) + 0.5)  # ROUND half-away-from-zero
            out.append(q if s >= 0 else -q)
        return out

    def ddot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y  # sequential fold, same order as F.aggregate
        return acc

    cents0 = {c: _init_centroid(c) for c in range(N_CELLS)}
    xqs = [quantize(v) for v in vecs]

    def assign_init(v):
        best, best_d = None, None
        for c in range(N_CELLS):
            d = ddot(v, cents0[c])
            if best is None or d > best_d:  # ties -> smaller cell (first wins)
                best, best_d = c, d
        return best

    assign = [assign_init(v) for v in vecs]
    cents: dict[int, list[int]] = {}
    for _ in range(iters):
        sums: dict[int, list[int]] = {}
        counts: dict[int, int] = {}
        for a, xq in zip(assign, xqs):
            if a not in sums:
                sums[a] = [0] * DIM
                counts[a] = 0
            counts[a] += 1
            for i, q in enumerate(xq):
                sums[a][i] += q
        cents = {}
        for c in sorted(sums):
            comp = []
            for s in sums[c]:
                q = abs(s) // counts[c]  # truncate toward zero
                comp.append(q if s >= 0 else -q)
            cents[c] = comp
        # reassign by exact integer dot, ties -> smaller cell
        new_assign = []
        for xq in xqs:
            best, best_d = None, None
            for c in sorted(cents):
                d = sum(x * w for x, w in zip(xq, cents[c]))
                if best is None or d > best_d:
                    best, best_d = c, d
            new_assign.append(best)
        assign = new_assign
    return cents


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("iters", [1, 2, 3])
def test_trainer_matches_python_referee(spark, seed, iters):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(5, 25))
    # float32 round-trip mirrors the parquet FLOAT[] storage; include
    # exact duplicates (tie pressure) and a sign-skewed cloud so some
    # cells carry negative component sums
    base = rng.uniform(-1.0, 1.0, size=(n, DIM)).astype(np.float32)
    if n >= 8:
        base[n // 2] = base[0]  # duplicate vector
        base[: n // 3] -= 0.8  # negative-heavy cluster
    vecs = [[float(x) for x in row] for row in np.clip(base, -1.0, 1.0)]

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    got = S.kmeans_train_int(
        df, vec_col="embedding", n_cells=N_CELLS, iters=iters, dim=DIM, quant=QUANT
    )
    want = _ref_train(vecs, iters)
    assert got == want