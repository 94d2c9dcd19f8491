"""Text analysis for large-scale training-data pipelines.

All pure ``pyspark.sql.functions`` column expressions — JVM-side,
whole-stage-codegen'd, zero Python in the hot path. Each operator mirrors
its DuckDB oracle in ``__spark_entry__.py`` token-for-token so the
correctness gate can hash-compare values.

Operators: token counting, quality scoring, language ID (marker-word
heuristic), document fingerprinting (content-defined, md5-based).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# tiny per-language marker lexicons for the n-gram/stopword heuristic —
# deterministic, shared verbatim with the SQL oracle
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "de", "que", "los", "las"],
}


def tokens(col) -> Column:
    """Whitespace tokenization, empty-safe (trim first)."""
    return F.split(F.trim(col), r"\s+")


def token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens) — whitespace token count per document."""
    return df.select(
        F.col(id_col),
        F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0))
        .otherwise(F.size(tokens(F.col(text_col))))
        .cast("long")
        .alias("n_tokens"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_chars, n_tokens, avg_token_len, punct_ratio, quality).

    Length / punctuation / mean-token-length heuristics; ``quality`` is a
    deterministic [0,1] blend. Thresholds are plain constants so the SQL
    oracle reproduces values bit-for-bit (integer counts, then one double
    expression).
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = F.when(F.length(F.trim(t)) == 0, F.lit(0)).otherwise(F.size(tokens(t)))
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[\.,;:!\?]", ""))
    avg_tok = F.when(n_tokens > 0, (n_chars.cast("double") / n_tokens)).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(F.lit(0.0))
    quality = F.round(
        F.least(F.lit(1.0), n_tokens.cast("double") / 100.0) * 0.5
        + F.when((avg_tok >= 3.0) & (avg_tok <= 10.0), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(punct_ratio <= 0.1, F.lit(0.2)).otherwise(F.lit(0.0)),
        6,
    )
    return df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(avg_tok, 6).alias("avg_token_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        quality.alias("quality"),
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, pred_lang, marker_hits) — argmax of marker-word hits.

    Hits counted on the lowercased token stream via explode + broadcast
    join against the marker lexicon (no regex-per-language scans); ties
    break to the lexicographically LARGEST language (struct-max semantics,
    mirrored by the oracle's ORDER BY hits DESC, cand_lang DESC — see the
    comment below); zero hits → 'und'.
    """
    spark = df.sparkSession
    markers = spark.createDataFrame(
        [(lang, w) for lang, ws in LANG_MARKERS.items() for w in ws],
        "cand_lang string, marker string",
    )
    tok = df.select(
        F.col(id_col),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("marker"),
    )
    hits = (
        tok.join(F.broadcast(markers), "marker")
        .groupBy(id_col, "cand_lang")
        .agg(F.count("*").alias("hits"))
    )
    best = hits.groupBy(id_col).agg(
        F.max(F.struct(F.col("hits"), F.col("cand_lang"))).alias("b")
    )
    # struct max: (hits asc, lang asc) — max picks highest hits, and for
    # equal hits the lexicographically LARGEST lang; to tie-break smallest,
    # invert via a second struct field would be needed — instead order by
    # (hits, reverse(lang)) is messy in SQL, so the engine defines the tie
    # winner as the lexicographically largest language, consistently with
    # the oracle.
    out = df.select(F.col(id_col)).join(best, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("b.cand_lang"), F.lit("und")).alias("pred_lang"),
        F.coalesce(F.col("b.hits"), F.lit(0)).cast("long").alias("marker_hits"),
    )
    return out


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, fp) — 16-hex-char document fingerprint.

    md5 of the normalized token stream (lowercase, single-space joined):
    robust to whitespace runs, deterministic, identical in the SQL oracle
    (DuckDB md5). This is the exact-dedup key for normalized content.
    """
    norm = F.concat_ws(" ", tokens(F.lower(F.col(text_col))))
    return df.select(
        F.col(id_col),
        F.substring(F.md5(norm), 1, 16).alias("fp"),
    )
