"""Training-data pipeline operators: dedup, text analysis, similarity,
multimodal plumbing — against the driver-generated documents/embeddings
tables at sf0.001 plus small inline frames."""

import pytest
from pyspark.sql import functions as F

from gelly_partitioning_spark.functions import (
    ann_lsh_topk,
    attach_media,
    cosine_topk,
    embedding_near_duplicates,
    exact_duplicates,
    extract_features,
    fingerprint,
    language_id,
    minhash_lsh_candidates,
    minhash_signatures,
    quality_score,
    simhash,
    token_count,
    token_jaccard_pairs,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture()
def tiny_docs(spark):
    rows = [
        (1, "the cat sat on the mat and the dog sat too"),
        (2, "the cat sat on the mat and the dog sat too"),          # exact dup of 1
        (3, "the cat sat on the mat and the dog stood up"),         # near dup
        (4, "der Hund ist und das der die gross und die"),          # German-ish
        (5, "completely different words entirely here nothing"),
        (6, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_count(tiny_docs):
    got = {r["doc_id"]: r["n_tokens"] for r in token_count(tiny_docs).collect()}
    assert got[1] == 11
    assert got[6] == 0


def test_exact_duplicates(tiny_docs):
    dups = exact_duplicates(tiny_docs).collect()
    assert len(dups) == 1
    assert dups[0]["doc_ids"] == [1, 2]


def test_fingerprint_normalizes_whitespace(spark):
    rows = [(1, "a  b\tc"), (2, "a b c"), (3, "a b d")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp = {r["doc_id"]: r["fp"] for r in fingerprint(df).collect()}
    assert fp[1] == fp[2] != fp[3]


def test_minhash_identical_docs_identical_sigs(tiny_docs):
    sig = {r["doc_id"]: r["sig"] for r in minhash_signatures(tiny_docs.filter("doc_id < 4")).collect()}
    assert sig[1] == sig[2]
    assert sig[1] != sig[3]


def test_minhash_lsh_finds_near_dups(tiny_docs):
    cands = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(tiny_docs.filter("doc_id <= 5")).collect()
    }
    assert (1, 2) in cands          # exact dup always collides on all bands
    assert (1, 5) not in cands      # unrelated docs should not collide


def test_token_jaccard(tiny_docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in token_jaccard_pairs(tiny_docs, min_jaccard=0.3).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and pairs[(1, 3)] < 1.0


def test_simhash_close_for_near_dups(tiny_docs):
    s = {r["id"]: r["simhash"] for r in simhash(tiny_docs.filter("doc_id <= 5")).collect()}
    assert s[1] == s[2]
    ham_13 = bin(s[1] ^ s[3]).count("1")
    ham_15 = bin(s[1] ^ s[5]).count("1")
    assert ham_13 < ham_15


def test_language_id(tiny_docs):
    got = {r["doc_id"]: r["pred_lang"] for r in language_id(tiny_docs).collect()}
    assert got[1] == "en"
    assert got[4] == "de"
    assert got[6] == "und"


def test_quality_score_ranges(documents):
    q = quality_score(documents)
    rows = q.collect()
    assert all(0.0 <= r["quality"] <= 1.0 for r in rows)
    assert all(r["punct_ratio"] <= 1.0 for r in rows)
    assert len(rows) == documents.count()


def test_cosine_topk_self_similarity(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [1.0, 0.01, 0.0]),
        (3, [0.0, 1.0, 0.0]),
        (4, [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    top1 = {
        r["id"]: r["neighbor"]
        for r in cosine_topk(df, k=1).collect()
    }
    assert top1[1] == 2 and top1[2] == 1


def test_cosine_topk_on_embeddings(embeddings):
    k = 3
    t = cosine_topk(embeddings.limit(60), k=k)
    rows = t.collect()
    assert len(rows) == 60 * k
    assert all(-1.0 - 1e-6 <= r["cos"] <= 1.0 + 1e-6 for r in rows)


def test_cosine_topk_numpy_matches_sql(embeddings):
    sub = embeddings.limit(50).cache()
    sql_rows = {
        (r["id"], r["rk"]): (r["neighbor"], r["cos"])
        for r in cosine_topk(sub, k=3, implementation="sql").collect()
    }
    np_rows = {
        (r["id"], r["rk"]): (r["neighbor"], r["cos"])
        for r in cosine_topk(sub, k=3, implementation="numpy").collect()
    }
    assert set(sql_rows) == set(np_rows)
    for key, (nb, cos) in sql_rows.items():
        nb2, cos2 = np_rows[key]
        assert abs(cos - cos2) < 1e-5
        # neighbor may differ only on cos ties
        if nb != nb2:
            assert abs(cos - cos2) < 1e-5


def test_ann_recall_vs_bruteforce(embeddings):
    sub = embeddings.limit(80).cache()
    exact = {(r["id"], r["neighbor"]) for r in cosine_topk(sub, k=3).collect()}
    approx = {
        (r["id"], r["neighbor"])
        for r in ann_lsh_topk(sub, k=3, n_planes=3, n_tables=12).collect()
    }
    recall = len(exact & approx) / len(exact)
    # random dim-64 embeddings have weak top-3 neighbors (cos ≈ 0.2-0.4);
    # (3,12) multi-table LSH must still recover a majority of them
    assert recall > 0.5, recall


def test_embedding_near_duplicates_symmetric_threshold(spark):
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.999, 0.001]),
        (3, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    nd = {(r["id_a"], r["id_b"]) for r in embedding_near_duplicates(df, min_cos=0.99).collect()}
    assert nd == {(1, 2)}


def test_multimodal_plumbing(tiny_docs):
    media = attach_media(tiny_docs.filter("doc_id <= 3"))
    assert media.schema["payload"].dataType.typeName() == "binary"
    feats = extract_features(media, fake=True, feature_dim=8).collect()
    assert len(feats) == 3
    assert all(len(r["feature"]) == 8 for r in feats)
    # identical content → identical features; differing content → differing
    by_id = {r["media_id"]: tuple(r["feature"]) for r in feats}
    assert by_id[1] == by_id[2] != by_id[3]


def test_multimodal_decode_unsupported_mime_raises(tiny_docs):
    # r4: fake=False is a real path for PPM/WAV (test_round4); mimes with
    # no in-sandbox codec (attach_media synthesizes image/x-fake) raise
    # from inside the UDF when the plan materializes
    media = attach_media(tiny_docs.limit(1))
    with pytest.raises(Exception, match="no in-sandbox codec"):
        extract_features(media, fake=False).collect()


def test_token_jaccard_prefix_equals_naive_stopword_corpus(spark):
    """Exactness of prefix filtering on a stopword-heavy corpus, and the
    scale bound: the ubiquitous token must enter (almost) no prefixes, so
    candidate pairs ≪ the naive join's D²/2 through the hot token."""
    import pandas as pd
    from pyspark.sql import functions as F
    from gelly_partitioning_spark.functions.dedup import tokens as _  # noqa: F401

    # 40 docs, every one contains 'the' (DF=40); near-dup clusters 0-3
    rows = []
    for i in range(40):
        cluster = i % 10
        extra = "zz" if i < 10 else f"u{i}"
        rows.append((i, f"the alpha{cluster} beta{cluster} gamma{cluster} {extra}"))
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))

    naive = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in token_jaccard_pairs(docs, min_jaccard=0.5, prefix_filter=False).collect()
    }
    fast = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in token_jaccard_pairs(docs, min_jaccard=0.5, prefix_filter=True).collect()
    }
    assert fast == naive and len(naive) > 0

    # bound: prefix index must not contain the hot token for most docs —
    # all docs have 5 tokens, prefix len = 5 - ceil(0.5*5) + 1 = 3, and
    # 'the' (DF=40) sorts last in every doc, so it's in no prefix
    tok = docs.select(
        F.col("doc_id").alias("id"),
        F.explode(F.array_distinct(F.split(F.trim(F.lower("text")), r"\s+"))).alias("tok"),
    )
    from pyspark.sql import Window

    dfreq = tok.groupBy("tok").agg(F.count("*").alias("dfreq"))
    sizes = tok.groupBy("id").agg(F.count("*").alias("sz"))
    ranked = (
        tok.join(dfreq, "tok")
        .withColumn(
            "pos",
            F.row_number().over(Window.partitionBy("id").orderBy("dfreq", "tok")),
        )
        .join(sizes, "id")
    )
    t = 0.5 - 1e-6
    pref = ranked.filter(F.col("pos") <= F.col("sz") - F.ceil(F.lit(t) * F.col("sz")) + 1)
    hot_in_prefix = pref.filter(F.col("tok") == "the").count()
    assert hot_in_prefix == 0


def test_cosine_topk_numpy_sharded_matches_sql(embeddings):
    """Force multiple reference shards (tiny shard budget) — the sharded
    merge must reproduce the single-pass / SQL flavor exactly."""
    sub = embeddings.limit(50)
    sql_t = {
        (r["id"], r["rk"]): r["neighbor"]
        for r in cosine_topk(sub, k=3, implementation="sql").collect()
    }
    sharded = {
        (r["id"], r["rk"]): r["neighbor"]
        for r in cosine_topk(
            sub, k=3, implementation="numpy", shard_bytes=4096
        ).collect()
    }
    assert sharded == sql_t
    # blocked grid flavor (4096-byte blocks force a multi-cell grid):
    # exact — identical (neighbor, rank) assignment to the SQL flavor
    blocked = {
        (r["id"], r["rk"]): r["neighbor"]
        for r in cosine_topk(
            sub, k=3, implementation="blocked", shard_bytes=4096
        ).collect()
    }
    assert blocked == sql_t


def test_ngram_jaccard_prefix_equals_naive(tiny_docs):
    from gelly_partitioning_spark.functions import ngram_jaccard_pairs

    naive = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(
            tiny_docs, n=3, min_jaccard=0.3, prefix_filter=False
        ).collect()
    }
    fast = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(
            tiny_docs, n=3, min_jaccard=0.3, prefix_filter=True
        ).collect()
    }
    assert fast == naive
    assert (1, 2) in {(a, b) for a, b, _ in naive}  # exact dup pair qualifies
