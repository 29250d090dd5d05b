"""Property test: the distributed exact-int64 PQ codebook trainer
(functions.similarity.pq_train_int — Arrow matmul kernels + one
groupBy per iteration) must agree EXACTLY — every codeword component —
with a pure-Python referee on random small corpora. The oracle parity
run (sim_pq_topk / sim_pq_distortion) checks one fixed corpus; this
exercises the adversarial corners: negative per-code sums (truncating
division direction), codes that lose every member mid-training
(codebook shrink), argmin ties (duplicate vectors), and the
init-vs-reassign boundary at iters=1."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pipe_s_spark.functions import similarity as S

DIM = 8
M = 2
K = 4
SUBDIM = DIM // M
QUANT = 1_000_000


def _ref_train(vecs: list[list[float]], iters: int) -> dict[tuple[int, int], list[int]]:
    """Pure-Python referee implementing the identical algorithm:
    double-argmax init over the md5 seeds (same IEEE fold order as
    the numpy left-to-right accumulation), then per-subspace integer
    means + exact-integer argmin-L2 reassignment."""

    def quantize(v):
        out = []
        for x in v:
            s = x * QUANT
            q = math.floor(abs(s) + 0.5)  # ROUND half-away-from-zero
            out.append(q if s >= 0 else -q)
        return out

    def ddot(a, b):
        acc = None
        for x, y in zip(a, b):
            t = x * y
            acc = t if acc is None else acc + t  # left-to-right fold
        return acc

    xqs = [quantize(v) for v in vecs]

    def init_code(v, sub):
        best, best_d = None, None
        for c in range(K):
            d = ddot(
                v[sub * SUBDIM:(sub + 1) * SUBDIM], S.pq_seed_centroid(sub, c, SUBDIM)
            )
            if best is None or d > best_d:  # ties -> smaller code (first wins)
                best, best_d = c, d
        return best

    assign = [[init_code(v, s) for s in range(M)] for v in vecs]
    books: dict[tuple[int, int], list[int]] = {}
    for _ in range(iters):
        sums: dict[tuple[int, int], list[int]] = {}
        counts: dict[tuple[int, int], int] = {}
        for codes, xq in zip(assign, xqs):
            for s in range(M):
                kk = (s, codes[s])
                if kk not in sums:
                    sums[kk] = [0] * SUBDIM
                    counts[kk] = 0
                counts[kk] += 1
                for i in range(SUBDIM):
                    sums[kk][i] += xq[s * SUBDIM + i]
        books = {}
        for kk in sorted(sums):
            comp = []
            for v in sums[kk]:
                q = abs(v) // counts[kk]  # truncate toward zero
                comp.append(q if v >= 0 else -q)
            books[kk] = comp
        # reassign by exact-integer argmin L2 key, ties -> smaller code
        new_assign = []
        for xq in xqs:
            row = []
            for s in range(M):
                best, best_key = None, None
                for c in sorted(c2 for (s2, c2) in books if s2 == s):
                    w = books[(s, c)]
                    csq = sum(x * x for x in w)
                    d = sum(
                        x * y for x, y in zip(xq[s * SUBDIM:(s + 1) * SUBDIM], w)
                    )
                    key = csq - 2 * d
                    if best is None or key < best_key:
                        best, best_key = c, key
                row.append(best)
            new_assign.append(row)
        assign = new_assign
    return books


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("iters", [1, 2, 3])
def test_pq_trainer_matches_python_referee(spark, seed, iters):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(5, 25))
    base = rng.uniform(-1.0, 1.0, size=(n, DIM)).astype(np.float32)
    if n >= 8:
        base[n // 2] = base[0]  # duplicate vector: argmin tie pressure
        base[: n // 3] -= 0.8  # negative-heavy cloud: trunc-div direction
    vecs = [[float(x) for x in row] for row in np.clip(base, -1.0, 1.0)]

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    got = S.pq_train_int(df, m=M, k=K, iters=iters, dim=DIM, quant=QUANT)
    want = _ref_train(vecs, iters)
    assert got == want


def test_pq_encode_matches_referee_assignment(spark):
    """The persisted encode table (pq_encode_table) must reproduce the
    referee's final assignment and exact keys."""
    rng = np.random.default_rng(7)
    vecs = [[float(x) for x in row] for row in rng.uniform(-1, 1, size=(12, DIM))]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    books = S.pq_train_int(df, m=M, k=K, iters=2, dim=DIM, quant=QUANT)
    enc = {
        int(r["vec_id"]): (list(r["codes"]), list(r["keys"]))
        for r in S.pq_encode_table(df, books, m=M, k=K, dim=DIM, quant=QUANT).collect()
    }
    for i, v in enumerate(vecs):
        xq = []
        for x in v:
            s = x * QUANT
            q = math.floor(abs(s) + 0.5)
            xq.append(q if s >= 0 else -q)
        for s in range(M):
            want_key, want_code = None, None
            for c in sorted(c2 for (s2, c2) in books if s2 == s):
                w = books[(s, c)]
                key = sum(x * x for x in w) - 2 * sum(
                    a * b for a, b in zip(xq[s * SUBDIM:(s + 1) * SUBDIM], w)
                )
                if want_key is None or key < want_key:
                    want_key, want_code = key, c
            assert enc[i][0][s] == want_code
            assert enc[i][1][s] == want_key


def test_grouped_adc_kernel_matches_expression_scoring(spark):
    """The per-cell LUT-gather kernel (grouped_adc_topk — the
    streaming index's probe) and the pq_adc_score expression (the
    batch queries' scorer) are two implementations of the same exact
    int64 ADC sum; on a single shared group their top-k must agree
    row-for-row including scores."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    rng = np.random.default_rng(11)
    vecs = [[float(x) for x in row] for row in rng.uniform(-1, 1, size=(30, DIM))]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    books = S.pq_train_int(df, m=M, k=K, iters=2, dim=DIM, quant=QUANT)
    enc = S.pq_encode_table(df, books, m=M, k=K, dim=DIM, quant=QUANT)
    luts = S.pq_lut_table(enc.filter(F.col("vec_id") < 5), books, m=M, k=K, dim=DIM)

    # expression scoring over the full cross product
    expr_scored = (
        enc.select("vec_id", "codes")
        .crossJoin(
            F.broadcast(luts.select(F.col("vec_id").alias("query_id"), "lut"))
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            S.pq_adc_score(F.col("lut"), F.col("codes"), m=M, k=K).alias("adc_dot"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("adc_dot"), "neighbor_id")
    want = {
        (r["query_id"], r["neighbor_id"], r["adc_dot"])
        for r in expr_scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .collect()
    }

    # kernel scoring: one shared group = the same full cross product
    got = {
        (r["query_id"], r["neighbor_id"], r["adc_dot"])
        for r in S.grouped_adc_topk(
            luts.select(
                F.lit(0).alias("cell"), F.col("vec_id").alias("query_id"), "lut"
            ),
            enc.select(F.lit(0).alias("cell"), "vec_id", "codes"),
            "cell",
            m=M,
            k_codes=K,
            k=3,
        ).collect()
    }
    assert got == want and len(want) == 15


def test_grouped_adc_in_kernel_lut_matches_shipped_lut(spark):
    """The in-kernel-LUT mode (books= — queries ship their packed
    512-byte xq and the kernel rebuilds the LUT from the
    closure-shipped codebook) must be BIT-IDENTICAL to the shipped-LUT
    mode on the same groups: same _fold_dot_np int64 fold, so every
    (query, neighbor, adc_dot) triple — scores included — must agree.
    This is the exactness contract that lets the streaming ADC index
    keep only the 8x-smaller xq column on the wire."""
    from pyspark.sql import functions as F

    rng = np.random.default_rng(23)
    vecs = [[float(x) for x in row] for row in rng.uniform(-1, 1, size=(40, DIM))]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    books = S.pq_train_int(df, m=M, k=K, iters=2, dim=DIM, quant=QUANT)
    enc = S.pq_encode_table(
        df, books, m=M, k=K, dim=DIM, quant=QUANT, pack_xq=True
    ).withColumn("cell", (F.col("vec_id") % 3).cast("int"))
    qs = enc.filter(F.col("vec_id") < 8)

    members = enc.select("cell", "vec_id", "codes")
    shipped = {
        (r["query_id"], r["neighbor_id"], r["adc_dot"])
        for r in S.grouped_adc_topk(
            S.pq_lut_table(qs.select("vec_id", "xq"), books, m=M, k=K, dim=DIM)
            .join(qs.select("vec_id", "cell"), "vec_id")
            .select("cell", F.col("vec_id").alias("query_id"), "lut"),
            members,
            "cell",
            m=M,
            k_codes=K,
            k=4,
        ).collect()
    }
    in_kernel = {
        (r["query_id"], r["neighbor_id"], r["adc_dot"])
        for r in S.grouped_adc_topk(
            qs.select("cell", F.col("vec_id").alias("query_id"), "xqb"),
            members,
            "cell",
            lut_col="xqb",
            m=M,
            k_codes=K,
            k=4,
            books=books,
            dim=DIM,
        ).collect()
    }
    assert in_kernel == shipped and len(shipped) > 0


def test_fused_prepare_matches_two_pass(spark):
    """ivf_adc_prepare_table (the streaming index's single-pass
    assign + probe + encode kernel) must be BIT-IDENTICAL to the
    two-pass composition it fuses — kmeans_assign_probes_table followed
    by pq_encode_table(pack_xq=True) — on every column the index
    consumes (codes, xqb, cell, probe_cells)."""
    from pyspark.sql import functions as F

    rng = np.random.default_rng(11)
    vecs = [[float(x) for x in row] for row in rng.uniform(-1, 1, size=(40, DIM))]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    books = S.pq_train_int(df, m=M, k=K, iters=2, dim=DIM, quant=QUANT)
    cents = S.kmeans_train_int(df, n_cells=4, iters=2, dim=DIM, quant=QUANT)
    nprobe = 2
    two_pass = {
        r["vec_id"]: (
            list(r["codes"]), bytes(r["xqb"]), r["cell"], list(r["probe_cells"])
        )
        for r in S.pq_encode_table(
            S.kmeans_assign_probes_table(
                df, cents, nprobe=nprobe, quant=QUANT
            ),
            books, m=M, k=K, dim=DIM, quant=QUANT,
            carry_cols={"cell": "int", "probe_cells": "array<int>"},
            pack_xq=True,
        ).collect()
    }
    fused = {
        r["vec_id"]: (
            list(r["codes"]), bytes(r["xqb"]), r["cell"], list(r["probe_cells"])
        )
        for r in S.ivf_adc_prepare_table(
            df, cents, books, nprobe=nprobe, m=M, k=K, dim=DIM, quant=QUANT
        ).collect()
    }
    assert fused == two_pass and len(fused) == 40
