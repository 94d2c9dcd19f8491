"""Deduplication operators for training-data pipelines.

Exact, MinHash+LSH, SimHash, and token-Jaccard near-dup — all expressed as
DataFrame ops whose hot path is JVM-side. The portable-hash trick: MinHash
permutations are ``min(md5(token || '#' || seed))`` over the token set —
md5 hex is identical in Spark and DuckDB, and the min of a uniformly-hashed
hex string is a valid min-wise permutation sample, so the SQL oracle
reproduces signatures bit-for-bit with no engine-specific hash.

Scale notes:
- exact dedup: one hash-groupBy on a 64-hex key — reducible, skew-free
  (content hashes are uniform).
- MinHash LSH: shingle explode → k seeded min-aggregations → band keys →
  self-join on band key. Band buckets are uniformly hashed, so the join is
  balanced; candidate verification is a second pass over candidate pairs
  only, never the full cross product.
- SimHash: 16 hex-nibble majority vote from md5(token) — bit ops on longs,
  Hamming-distance verify over LSH-band candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import tokens


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(sha, n_docs, doc_ids) for content appearing more than once.

    Hash-groupBy on sha2-256 of raw content (SURVEY: dedup-exact).
    ``doc_ids`` kept sorted for deterministic output.
    """
    return (
        df.select(F.col(id_col), F.sha2(F.col(text_col), 256).alias("sha"))
        .groupBy("sha")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sort_array(F.collect_list(F.col(id_col))).alias("doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


def _shingles_of(toks, n: int = 3):
    """Word n-gram shingles (distinct) from a token-array column.

    IMPORTANT: pass a *bound column reference* to a materialized token
    array, not the tokenizing expression itself — ``toks`` is evaluated
    once per element of the sliding window, so an inlined
    ``split(trim(...))`` would re-run the regex tokenizer O(#tokens)
    times per row (measured 4.5 s → 0.6 s for minhash_lsh at sf0.1;
    guide §1.2: per-task work). ``_shingles`` / the two-projection
    callers below keep that contract.
    """
    # sliding window via transform over index range; filter out short tails
    return F.array_distinct(
        F.filter(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            ),
            lambda s: F.length(s) > 0,
        )
    )


def _shingles(text_col, n: int = 3):
    """Word n-gram shingles of the lowercased token stream (distinct)."""
    return _shingles_of(tokens(F.lower(text_col)), n)


def _exploded_shingles(
    df: DataFrame, text_col: str, id_col: str, n: int, out: str
) -> DataFrame:
    """(id, <out>) — one row per distinct shingle, with the token array
    materialized in its own projection first so the tokenizer runs once
    per row (see _shingles_of)."""
    return df.select(
        F.col(id_col).alias("id"), tokens(F.lower(F.col(text_col))).alias("_toks")
    ).select("id", F.explode(_shingles_of(F.col("_toks"), n)).alias(out))


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sig array<string>) — portable MinHash over word shingles."""
    sh = _exploded_shingles(df, text_col, id_col, shingle_n, "shingle").withColumnRenamed(
        "id", id_col
    )
    aggs = [
        F.min(F.md5(F.concat(F.col("shingle"), F.lit(f"#{k}")))).alias(f"h{k}")
        for k in range(num_hashes)
    ]
    sig = sh.groupBy(id_col).agg(*aggs)
    return sig.select(
        F.col(id_col), F.array(*[F.col(f"h{k}") for k in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """(id_a, id_b, n_bands) candidate near-dup pairs sharing ≥1 LSH band.

    rows-per-band = num_hashes / bands. Self-join keyed on (band index,
    band value) — uniform hash keys, balanced shuffle.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    # materialize the (tiny: #docs x bands rows) banded table ONCE: both
    # self-join sides reference it, and unmaterialized the whole shingle
    # explode + 8-way md5 min-agg pipeline ran twice — the plan showed
    # two full document scans, one per side, because the broadcast side
    # cannot reuse the other side's exchange (guide §1.2/§5; lazy, so
    # the first side's job writes it and the second reads it)
    banded = sig.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.array(
                *[
                    F.concat_ws("|", *[F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)])
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_key"),
    ).localCheckpoint(eager=False)
    a = banded.select(F.col("id").alias("id_a"), "band", "band_key")
    b = banded.select(F.col("id").alias("id_b"), "band", "band_key")
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("n_bands"))
    )


def token_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_jaccard: float = 0.5,
    prefix_filter: bool = True,
    emit_counts: bool = False,
) -> DataFrame:
    """Doc pairs with token-set Jaccard ≥ cutoff — (id_a, id_b, jaccard),
    or (id_a, id_b, inter_cnt, union_cnt) with ``emit_counts=True``
    (bit-exact integers for cross-engine comparison).

    ``prefix_filter=True`` (default, the 100 TB path) generates candidate
    pairs by joining only each document's *prefix tokens* — its rarest
    (|A| − ⌈t·|A|⌉ + 1) tokens under a global (document-frequency, token)
    order — then verifies candidates exactly against the full token sets.
    Soundness is the classic prefix-filtering lemma (Bayardo et al.,
    WWW'07 "Scaling Up All Pairs Similarity Search"; Xiao et al. PPJoin):
    if |A∩B| ≥ α then the (|A|−α+1)- and (|B|−α+1)-prefixes share a
    token, and J ≥ t ⇒ |A∩B| ≥ ⌈t·|A|⌉, ⌈t·|B|⌉. The candidate threshold
    is relaxed by 1e-6 so the rounded-jaccard output filter can never
    admit a pair the prefix join missed. A stopword with document
    frequency D sits at the *end* of the global order and enters almost
    no prefixes — the naive inverted-index self-join would emit D²/2
    pairs through it (the round-1 scale-killer); the prefix join is
    bounded by the rare-token index instead.

    ``prefix_filter=False`` is the naive inverted-index join (the oracle
    twin; same |A∩B| / |A∪B| arithmetic as library/Jaccard.java:142-150).
    """
    tok = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(tokens(F.lower(F.col(text_col))))).alias("tok"),
    )
    return _jaccard_pairs(tok, min_jaccard, prefix_filter, emit_counts)


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_jaccard: float = 0.5,
    prefix_filter: bool = True,
    emit_counts: bool = False,
) -> DataFrame:
    """Word n-gram (shingle) Jaccard near-dup — same machinery as
    ``token_jaccard_pairs`` over the distinct shingle set (the set MinHash
    approximates; this is its exact counterpart). Shingles are rarer than
    tokens, so the prefix filter is even more selective here."""
    sh = _exploded_shingles(df, text_col, id_col, n, "tok")
    return _jaccard_pairs(sh, min_jaccard, prefix_filter, emit_counts)


def _jaccard_pairs(
    tok: DataFrame, min_jaccard: float, prefix_filter: bool, emit_counts: bool
) -> DataFrame:
    """Shared core: (id, tok) exploded distinct elements → qualifying pairs."""
    # r6: the exploded token stream feeds FOUR subtrees on the prefix
    # path (sizes, dfreq, the ranked prefix build, toksets) and two on
    # the naive path — unmaterialized, each re-ran the upstream
    # tokenizer explode (guide §1.2/§5: cache what is reused; lazy, so
    # the first consumer's job writes it)
    tok = tok.localCheckpoint(eager=False)
    # sizes: 3 consumers (ranked build + both sides of the final join)
    sizes = (
        tok.groupBy("id")
        .agg(F.count("*").cast("long").alias("sz"))
        .localCheckpoint(eager=False)
    )

    if prefix_filter:
        from pyspark.sql import Window

        t_gen = max(min_jaccard - 1e-6, 0.0)  # relaxed for the rounded filter
        dfreq = tok.groupBy("tok").agg(F.count("*").alias("dfreq"))
        ranked = (
            tok.join(dfreq, "tok")
            .withColumn(
                "pos",
                F.row_number().over(
                    Window.partitionBy("id").orderBy(F.col("dfreq"), F.col("tok"))
                ),
            )
            .join(sizes, "id")
        )
        # pref is referenced by BOTH candidate-join sides; toksets by
        # both verification joins — one materialization each
        pref = ranked.filter(
            F.col("pos")
            <= F.col("sz") - F.ceil(F.lit(t_gen) * F.col("sz")) + F.lit(1)
        ).select("id", "tok").localCheckpoint(eager=False)
        cand = (
            pref.select(F.col("id").alias("id_a"), "tok")
            .join(pref.select(F.col("id").alias("id_b"), "tok"), "tok")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        toksets = tok.groupBy("id").agg(
            F.sort_array(F.collect_list("tok")).alias("ts")
        ).localCheckpoint(eager=False)
        inter = (
            cand.join(
                toksets.select(F.col("id").alias("id_a"), F.col("ts").alias("ta")), "id_a"
            )
            .join(toksets.select(F.col("id").alias("id_b"), F.col("ts").alias("tb")), "id_b")
            .select(
                "id_a",
                "id_b",
                F.size(F.array_intersect("ta", "tb")).cast("long").alias("inter"),
            )
            .filter(F.col("inter") > 0)
        )
    else:
        inter = (
            tok.select(F.col("id").alias("id_a"), "tok")
            .join(tok.select(F.col("id").alias("id_b"), "tok"), "tok")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count("*").cast("long").alias("inter"))
        )

    joined = inter.join(
        sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sa")), "id_a"
    ).join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sb")), "id_b")
    union_cnt = (F.col("sa") + F.col("sb") - F.col("inter")).cast("long")
    if emit_counts:
        # integer-exact threshold: inter ≥ t·union with t exactly
        # representable (e.g. 0.75) matches inter*4 ≥ union*3
        return joined.filter(
            F.col("inter").cast("double") >= F.lit(min_jaccard) * union_cnt.cast("double")
        ).select(
            "id_a",
            "id_b",
            F.col("inter").alias("inter_cnt"),
            union_cnt.alias("union_cnt"),
        )
    return joined.select(
        "id_a",
        "id_b",
        F.round(F.col("inter") / union_cnt.cast("double"), 6).alias("jaccard"),
    ).filter(F.col("jaccard") >= min_jaccard)


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash: long) — 60-bit SimHash from per-token md5 bits.

    Majority vote per bit over the distinct token set: bit b of md5(token)
    contributes ±1. Implemented with explode + conv(md5↦long) + bitwise
    ops — JVM-side throughout. 60 bits (15 hex chars of md5), not 64: the
    value stays below 2^60 so ``conv(hex,16,10)`` (Spark) and
    ``('0x'||hex)::BIGINT`` (DuckDB) agree without signed-overflow
    semantics — the portability bound of the cross-engine oracle.
    """
    tok = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(tokens(F.lower(F.col(text_col))))).alias("tok"),
    )
    h = tok.select(
        "id", F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long").alias("h")
    )
    votes = h.select(
        "id",
        *[
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
            .alias(f"b{b}")
            for b in range(60)
        ],
    ).groupBy("id").agg(*[F.sum(f"b{b}").alias(f"b{b}") for b in range(60)])
    sim = votes.select(
        "id",
        sum(
            [
                F.when(F.col(f"b{b}") > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0).cast("long"))
                for b in range(60)
            ],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    return sim
