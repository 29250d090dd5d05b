"""Text-analysis operators for large-scale training-data pipelines.

All pure Catalyst expressions (no Python UDFs): tokenization, token
counting (whitespace + BPE-ish regex), quality scoring, language-ID
heuristics, document fingerprinting. Each returns a composable
transform; the queries_text/queries_dedup modules wire them to DuckDB oracles.

Scale: every operator here is a narrow map — no shuffle, fully
pipelined inside whole-stage codegen, linear in bytes scanned. That is
the property that matters at 100 TB: text scoring is scan-bound, so
the engine's job is to never add a shuffle or a Python boundary.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tiny English stopword set for the heuristic language detector.
EN_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")

#: BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation.
BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of lowercased text (empty tokens removed)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_remove(F.split(F.lower(c), r"\s+"), "")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("bigint")


def bpe_ish_count(col: Column | str) -> Column:
    """Count of BPE-ish pre-tokens — a cheap token-budget estimator."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(F.lower(c), F.lit(BPE_ISH_PATTERN)).cast("bigint")


def stopword_hits(col: Column | str, words: tuple[str, ...] = EN_STOPWORDS) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(F.lower(c), F.lit(pat)).cast("bigint")


def punct_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(F.lower(c), F.lit(r"[^a-z0-9\s]")).cast("bigint")


def quality_score(col: Column | str) -> Column:
    """Heuristic quality in [0,1]: length band + stopword presence -
    punctuation excess. Deterministic double arithmetic (identical
    rounding on the oracle side)."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c).cast("double")
    n_toks = token_count(c).cast("double")
    sw_ratio = stopword_hits(c).cast("double") / F.greatest(n_toks, F.lit(1.0))
    punct_ratio = punct_count(c).cast("double") / F.greatest(n_chars, F.lit(1.0))
    length_component = F.least(n_chars / F.lit(400.0), F.lit(1.0)) * 0.5
    sw_component = F.least(sw_ratio * F.lit(5.0), F.lit(1.0)) * 0.3
    punct_penalty = F.least(punct_ratio * F.lit(4.0), F.lit(1.0)) * 0.2
    return F.round(length_component + sw_component + (0.2 - punct_penalty), 6)


def quality_score_sql(expr: str) -> str:
    """DuckDB rendering of :func:`quality_score` (same arithmetic)."""
    pat = r"\b(" + "|".join(EN_STOPWORDS) + r")\b"
    n_chars = f"CAST(LENGTH({expr}) AS DOUBLE)"
    n_toks = (
        f"CAST(len(list_filter(regexp_split_to_array(lower({expr}), '\\s+'),"
        f" t -> t <> '')) AS DOUBLE)"
    )
    sw = f"CAST(len(regexp_extract_all(lower({expr}), '{pat}')) AS DOUBLE)"
    punct = f"CAST(len(regexp_extract_all(lower({expr}), '[^a-z0-9\\s]')) AS DOUBLE)"
    return (
        f"ROUND(LEAST({n_chars} / 400.0, 1.0) * 0.5"
        f" + LEAST({sw} / GREATEST({n_toks}, 1.0) * 5.0, 1.0) * 0.3"
        f" + (0.2 - LEAST({punct} / GREATEST({n_chars}, 1.0) * 4.0, 1.0) * 0.2), 6)"
    )


def lang_id(col: Column | str, threshold: float = 0.05) -> Column:
    """N-gram/stopword heuristic language ID: 'en' iff the English
    stopword share of tokens exceeds the threshold."""
    c = F.col(col) if isinstance(col, str) else col
    ratio = stopword_hits(c).cast("double") / F.greatest(
        token_count(c).cast("double"), F.lit(1.0)
    )
    return F.when(ratio > threshold, F.lit("en")).otherwise(F.lit("other"))


def fingerprint(col: Column | str) -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted
    distinct token set (cf. MinHash's shingle-set view)."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(col)))))


def fingerprint_sql(expr: str) -> str:
    return (
        f"md5(array_to_string(list_sort(list_distinct("
        f"list_filter(regexp_split_to_array(lower({expr}), '\\s+'), t -> t <> ''))), ' '))"
    )


def with_text_stats(text_col: str = "text") -> Callable[[DataFrame], DataFrame]:
    """Attach the standard text-statistics columns."""

    def _apply(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("n_chars_calc", F.length(text_col).cast("bigint"))
            .withColumn("n_tokens", token_count(text_col))
            .withColumn("n_bpe_tokens", bpe_ish_count(text_col))
            .withColumn("n_stopwords", stopword_hits(text_col))
            .withColumn("quality", quality_score(text_col))
            .withColumn("lang_pred", lang_id(text_col))
        )

    return _apply


# --- PII detection / redaction -------------------------------------------
#
# Classic pre-training scrub pass. Patterns are deliberately simple,
# identical regex dialect on both engines (no lookarounds), and applied
# as narrow expressions — the scrub runs inside the scan's projection
# at 100 TB, no shuffle. The synthetic corpus contains no PII (asserted
# by the oracle run returning zero counts); the kernels are exercised
# on crafted rows in tests/test_scale_guards.py.

PII_PATTERNS: dict[str, str] = {
    "email": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_count(col: Column | str, kind: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(PII_PATTERNS[kind])).cast("bigint")


def pii_count_sql(expr: str, kind: str) -> str:
    # DuckDB single-quoted literals keep backslashes verbatim — the
    # pattern goes in as-is (doubling them would corrupt the regex).
    return f"CAST(len(regexp_extract_all({expr}, '{PII_PATTERNS[kind]}')) AS BIGINT)"


def pii_scrub(col: Column | str) -> Column:
    """Replace every PII match with a typed placeholder token —
    chained regexp_replace, email first so its host part is not first
    mangled by the ipv4 rule."""
    c = F.col(col) if isinstance(col, str) else col
    for kind in ("email", "phone", "ipv4"):
        c = F.regexp_replace(c, PII_PATTERNS[kind], f"<{kind}>")
    return c


def pii_scrub_sql(expr: str) -> str:
    """DuckDB rendering ('g' flag: DuckDB replaces only the first
    match by default, Spark replaces all)."""
    out = expr
    for kind in ("email", "phone", "ipv4"):
        out = f"regexp_replace({out}, '{PII_PATTERNS[kind]}', '<{kind}>', 'g')"
    return out


def repetition_stats(df: "DataFrame", id_col: str, text_col: str) -> "DataFrame":
    """Per-document repetition counters (Gopher-style filters) as an
    Arrow-batched mapInPandas kernel: top-token occurrency, 2-gram
    occurrence/distinct counts. Repetition is a PER-DOC property, so
    computing it in the row's own kernel is a narrow map — ZERO
    shuffle, vs the corpus-sized exchange a groupBy(doc, token)
    formulation pays at 100 TB. Tokenization matches ``tokens()``
    (lowercase, ASCII whitespace runs, drop empties — the dialect all
    three engines agree on; see dedup.shingles). Docs with fewer than
    2 tokens are dropped (no 2-grams — mirrors the oracle's inner
    join)."""
    import re
    from collections import Counter

    ws = re.compile(r"\s+", re.ASCII)

    def kernel(batches):
        import pandas as pd

        for b in batches:
            out: dict[str, list] = {
                id_col: [], "n_tokens": [], "top_tok_cnt": [],
                "n_2grams": [], "n_2grams_distinct": [],
            }
            for did, text in zip(b[id_col], b[text_col]):
                toks = [t for t in ws.split((text or "").lower()) if t]
                if len(toks) < 2:
                    continue
                grams = [f"{a} {c}" for a, c in zip(toks, toks[1:])]
                out[id_col].append(did)
                out["n_tokens"].append(len(toks))
                out["top_tok_cnt"].append(max(Counter(toks).values()))
                out["n_2grams"].append(len(grams))
                out["n_2grams_distinct"].append(len(set(grams)))
            yield pd.DataFrame(out)

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, text_col).mapInPandas(
        kernel,
        schema=(
            f"{id_col} {id_type}, n_tokens long, top_tok_cnt long,"
            " n_2grams long, n_2grams_distinct long"
        ),
    )
