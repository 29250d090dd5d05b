"""Deduplication operators: exact, normalized, n-gram Jaccard,
MinHash+LSH, SimHash.

Design for 100 TB:
- exact/normalized dedup is a hash-groupBy — one shuffle on the digest,
  map-side partial aggregation, no data skew (md5 is uniform);
- n-gram Jaccard avoids the O(n^2) cross join by exploding shingles and
  self-joining on the shingle (inverted index) — cost is bounded by
  shingle-collision volume, and the same plan is what LSH banding
  produces with fewer candidates;
- MinHash signatures are per-doc narrow aggregations; LSH banding turns
  near-dup search into an equi-join on (band, signature) — the classic
  shuffle-friendly formulation (Broder'97; Leskovec et al., MMDS ch.3);
- SimHash is a per-doc 16-bit signature via bit-majority voting
  (Charikar'02), also a narrow aggregation.

Every hash is md5-based so the DuckDB oracle can reproduce signatures
bit-for-bit (engine-native hash() functions differ between engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pipe_s_spark.functions.text import tokens


def normalize_text(col: Column | str) -> Column:
    """Canonical form for near-exact dedup: lowercase, strip
    non-alphanumerics, collapse whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.lower(c)
    out = F.regexp_replace(out, r"[^a-z0-9\s]", "")
    out = F.regexp_replace(out, r"\s+", " ")
    return F.trim(out)


NORMALIZE_SQL = (
    "trim(regexp_replace(regexp_replace(lower({expr}), '[^a-z0-9\\s]', '', 'g'),"
    " '\\s+', ' ', 'g'))"
)


def shingles(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Distinct k-token shingles per document.

    Computed as a pure array expression (transform over an index
    sequence), so shingling is a narrow map — no shuffle, no window —
    and the only exchange in a dedup plan is the one the downstream
    groupBy/join needs anyway. (An earlier window-lead formulation cost
    two extra per-doc sorts; results are identical.)"""
    c = tokens(text_col)
    idx = F.when(F.size(c) >= k, F.sequence(F.lit(0), F.size(c) - k)).otherwise(
        F.array().cast("array<int>")
    )
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(c, (i + j + 1).cast("int")) for j in range(k)]),
    )
    return (
        df.select(F.col(id_col), F.explode(F.array_distinct(sh)).alias("shingle"))
        .filter(F.col("shingle") != "")
        .distinct()
    )


def minhash_signature(sh: DataFrame, id_col: str, num_hashes: int = 16) -> DataFrame:
    """MinHash signature per doc: h_i = min(md5(shingle || '#i')) over
    the doc's shingle set, using the 16-hex-char prefix lexicographically
    (deterministic + oracle-reproducible)."""
    aggs = [
        F.min(F.substring(F.md5(F.concat(F.col("shingle"), F.lit(f"#{i}"))), 1, 16)).alias(
            f"h{i}"
        )
        for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_bands(sig: DataFrame, id_col: str, num_hashes: int = 16, bands: int = 4) -> DataFrame:
    """Band the signature: rows/band = num_hashes/bands; docs sharing
    any (band_id, band_sig) are candidate pairs after an equi-join."""
    rows = num_hashes // bands
    parts = []
    for b in range(bands):
        cols = [F.col(f"h{i}") for i in range(b * rows, (b + 1) * rows)]
        parts.append(
            F.struct(F.lit(b).alias("band_id"), F.concat_ws("|", *cols).alias("band_sig"))
        )
    return sig.select(id_col, F.explode(F.array(*parts)).alias("band")).select(
        id_col, F.col("band.band_id").alias("band_id"), F.col("band.band_sig").alias("band_sig")
    )


def simhash16(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """16-bit SimHash per document: each distinct token votes ±1 on each
    bit of conv(md5(token)[:4], 16, 10); the sign of the vote sum sets
    the bit."""
    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok")).distinct()
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 4), 16, 10).cast("long")
    voted = toks.select(
        id_col, *[((F.shiftright(h, j) % 2) * 2 - 1).alias(f"b{j}") for j in range(16)]
    )
    summed = voted.groupBy(id_col).agg(
        *[F.sum(F.col(f"b{j}")).alias(f"s{j}") for j in range(16)]
    )
    bits = [
        F.when(F.col(f"s{j}") > 0, F.lit(2**j)).otherwise(F.lit(0)) for j in range(16)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return summed.select(id_col, out.cast("bigint").alias("simhash"))
