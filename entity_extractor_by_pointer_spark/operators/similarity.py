"""Similarity search over embedding columns.

- ``ann_topk_bruteforce``: exact cosine top-k — the correctness baseline.
  Query set × corpus as a broadcast join (queries are small), dot products
  as built-in higher-order functions, per-query top-k via window rank.
- ``ann_topk_lsh``: the scale path — random-hyperplane LSH buckets the
  corpus; each query only scans its own bucket (plus optional multi-probe
  neighbors). Hyperplanes are seeded numpy constants baked into the plan as
  array literals, so the same planes are reproducible in the DuckDB oracle.
- ``ivf_assign``: IVF-style coarse quantization — assign each vector to the
  nearest of K seeded centroids; the probe path scans matching cells only.

At 100 TB the broadcast side is the query batch and the corpus stays
partitioned; no shuffle of the corpus happens in either path (bucketing is a
narrow projection + the final top-k is a partial aggregation per partition
coalesced by AQE).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..cache import cached

ANN_DIM = 64
LSH_PLANES = 6
LSH_SEED = 20240816
IVF_CELLS = 8


def _dot(va, vb):
    return F.aggregate(F.zip_with(va, vb, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)


def _norm(v):
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))


def ann_topk_bruteforce(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, rank): exact cosine top-k per query.

    Ties broken by neighbor id ascending for determinism.
    """
    corpus = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("vc"),
        _norm(F.col(vec_col).cast("array<double>")).alias("nc"),
    )
    qs = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("vq"),
        _norm(F.col(vec_col).cast("array<double>")).alias("nq"),
    )
    joined = corpus.join(F.broadcast(qs), F.col("query_id") != F.col("neighbor_id"))
    scored = joined.withColumn("cosine", _dot(F.col("vq"), F.col("vc")) / (F.col("nq") * F.col("nc")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def lsh_planes(n_planes: int = LSH_PLANES, dim: int = ANN_DIM, seed: int = LSH_SEED) -> np.ndarray:
    return np.random.default_rng(seed).normal(0, 1.0, (n_planes, dim))


def bucket_expr(vec_col, planes: np.ndarray):
    """Sign-pattern bucket id from hyperplane projections (built-in exprs)."""
    bucket = F.lit(0)
    for p, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        proj = _dot(vec_col, arr)
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def ann_topk_lsh(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: np.ndarray | None = None,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    ``broadcast_queries=False`` drops the forced broadcast hint on the
    query side — required when the caller ranks a corpus against ITSELF
    (census-gated entity relatedness above its brute ceiling), where the
    query side is as big as the corpus and a forced hint would OOM instead
    of degrading to a shuffle join on the bucket key."""
    planes = lsh_planes() if planes is None else planes
    corpus = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("vc"),
    ).withColumn("bucket", bucket_expr(F.col("vc"), planes)).withColumn("nc", _norm(F.col("vc")))
    qs = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("vq"),
    ).withColumn("bucket", bucket_expr(F.col("vq"), planes)).withColumn("nq", _norm(F.col("vq")))
    q_side = F.broadcast(qs) if broadcast_queries else qs
    joined = corpus.join(q_side, "bucket").where(F.col("query_id") != F.col("neighbor_id"))
    scored = joined.withColumn("cosine", _dot(F.col("vq"), F.col("vc")) / (F.col("nq") * F.col("nc")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ivf_centroids(n_cells: int = IVF_CELLS, dim: int = ANN_DIM, seed: int = LSH_SEED + 1) -> np.ndarray:
    c = np.random.default_rng(seed).normal(0, 1.0, (n_cells, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def best_cell_expr(v, centroids: np.ndarray):
    """Column: nearest-centroid index by cosine (ties → lowest index:
    array_position finds the FIRST max — mirrored in the oracle's ORDER BY
    cell ASC). Built as an array argmax so each centroid score is computed
    exactly once; a when-chain argmax re-embeds every prior score expression
    in each branch and blows up the codegen tree (~10× slower measured)."""
    nv = _norm(v)
    scores = F.array(
        *[_dot(v, F.array(*[F.lit(float(x)) for x in c])) / nv for c in centroids]
    )
    return (F.array_position(scores, F.array_max(scores)) - 1).cast("int")


def ivf_assign(
    embeddings: DataFrame,
    centroids: np.ndarray | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cell): nearest seeded centroid by cosine (IVF coarse step).

    At scale the output is written bucketed by ``cell`` so probes prune
    whole files via partition pruning.
    """
    centroids = ivf_centroids() if centroids is None else centroids
    from ..partitioning import spread_small_scan

    v = F.col(vec_col).cast("array<double>")
    return spread_small_scan(embeddings.select(id_col, vec_col)).select(
        F.col(id_col), best_cell_expr(v, centroids).alias("cell")
    )


def top_cells_expr(v, centroids: np.ndarray, nprobe: int):
    """Column: the ``nprobe`` nearest centroid indices by cosine, ordered
    best-first (ties → lower cell, matching ``best_cell_expr`` and the
    oracle's ``ORDER BY score DESC, cell ASC``). Scores are the same
    ordered-fold doubles as ``best_cell_expr``, so nprobe=1 reduces to it."""
    nv = _norm(v)
    entries = F.array(
        *[
            F.struct(
                (_dot(v, F.array(*[F.lit(float(x)) for x in c])) / nv).alias("score"),
                F.lit(-ci).alias("negcell"),
            )
            for ci, c in enumerate(centroids)
        ]
    )
    # sort desc: score desc, then negcell desc ≡ cell asc on score ties
    top = F.slice(F.sort_array(entries, asc=False), 1, nprobe)
    return F.transform(top, lambda s: (-s["negcell"]).cast("int"))


def materialize_ivf_corpus(
    embeddings: DataFrame,
    path: str,
    centroids: np.ndarray | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Write the IVF-indexed corpus ``(id, vector, cell)`` PARTITIONED BY
    cell (the parquet stand-in for an Iceberg ``bucket``/identity transform)
    and return a reader over it. This is the ``ivf_assign`` output the probe
    path reads: probing then PRUNES whole cell partitions instead of
    recomputing centroid scores over the corpus at query time. Idempotent:
    an existing _SUCCESS marker short-circuits the write."""
    import os

    spark = embeddings.sparkSession
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from ..partitioning import spread_small_scan

        centroids = ivf_centroids() if centroids is None else centroids
        v = F.col(vec_col).cast("array<double>")
        (
            spread_small_scan(embeddings.select(id_col, vec_col)).select(
                F.col(id_col), v.alias(vec_col), best_cell_expr(v, centroids).alias("cell")
            )
            .repartition("cell")
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(path)
        )
    return spark.read.parquet(path)


def ann_topk_ivf(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    centroids: np.ndarray | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """IVF probe: each query scans only its ``nprobe`` nearest coarse cells.

    Completes the IVF pair with ``ivf_assign``/``materialize_ivf_corpus``:
    pass ``assigned`` (a corpus frame that already carries a ``cell`` column
    — typically the cell-partitioned materialized table) and the probe is a
    partition-prunable scan joined with the broadcast query batch — no
    centroid math over the corpus, no corpus shuffle. Without ``assigned``
    the cell is computed inline (fine for ad-hoc runs; materialize at
    scale). Exact within the probed cells; recall across cells is the
    standard IVF trade-off that ``nprobe`` trades back."""
    centroids = ivf_centroids() if centroids is None else centroids
    if assigned is not None:
        corpus = assigned.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("vc"),
            F.col("cell").cast("int").alias("cell"),
        )
    else:
        corpus = embeddings.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("vc"),
        ).withColumn("cell", best_cell_expr(F.col("vc"), centroids))
    corpus = corpus.withColumn("nc", _norm(F.col("vc")))
    qs = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("vq"),
    )
    qs = qs.withColumn(
        "cell", F.explode(top_cells_expr(F.col("vq"), centroids, nprobe))
    ).withColumn("nq", _norm(F.col("vq")))
    joined = corpus.join(F.broadcast(qs), "cell").where(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = joined.withColumn(
        "cosine", _dot(F.col("vq"), F.col("vc")) / (F.col("nq") * F.col("nc"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def kmeans_centroids(
    embeddings: DataFrame,
    iterations: int = 3,
    centroids: np.ndarray | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed Lloyd k-means refinement of the IVF coarse centroids.

    Per iteration: assign every vector to its max-cosine centroid, then
    new centroid = per-dimension mean of members, ROUNDED to 6 decimals.
    The rounding is what makes the whole recursion cross-engine exact:
    both engines compute dots as ordered folds over identical rounded
    centroids, so assignments are bitwise deterministic and the only float
    noise (mean partial-sum order) is absorbed by the per-iteration
    rounding. Cells that lose all members keep their previous centroid.
    Returns (cell, dim, val) rows of the final centroids — the shape the
    driver's value-hash comparison can check.

    Scale shape per iteration: each vector picks its cell row-locally in
    ONE mapInPandas pass whose dots/norms are accumulated dimension by
    dimension — the exact left-to-right IEEE folds of the former
    aggregate(zip_with) columns, with np.argmax's first-max matching the
    (cos DESC, cell ASC) tie rule of the former struct-max aggregate, so
    every assignment is bit-identical. Then the one fundamentally
    required (cell, dim) mean aggregation runs — map-side combined, k·dim
    result rows. The per-iteration id-keyed argmax SHUFFLE of every
    vector and the eager localCheckpoint job are gone; the k·dim new
    centroids come back through a collect of the aggregate (fixed-size
    model state, the same class as the engine's 1-row census fetches —
    scale-independent), which also truncates lineage better than the
    checkpoint did. (A literal-centroid Catalyst variant measured SLOWER:
    each iteration's new constants defeat the codegen cache and recompile
    the stage, ~1.3s/iteration on this host.)
    """
    import math

    init = ivf_centroids() if centroids is None else centroids
    k, dim = init.shape
    spark = embeddings.sparkSession
    from ..partitioning import spread_small_scan

    vecs = spread_small_scan(embeddings.select(id_col, vec_col)).select(
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    vecs = cached(vecs)
    cents_vals = [[round(float(x), 6) for x in init[ci]] for ci in range(k)]
    for _ in range(iterations):
        # centroid lengths can drift apart once a cell absorbs shorter or
        # longer member vectors (the SQL collect_list rebuild had the same
        # property) — pad the matrix for vectorization, keep true lengths
        k_lens = [len(cv) for cv in cents_vals]
        cents_np = np.zeros((k, max(k_lens) if k_lens else 0))
        for ci, cv in enumerate(cents_vals):
            cents_np[ci, : len(cv)] = cv
        cnorms = []
        for cv in cents_vals:
            # same sequential fold the SQL _norm applies to the rounded
            # centroid array — Python floats are IEEE doubles, so the
            # bits match the former broadcast-join column exactly
            acc = 0.0
            for x in cv:
                acc = acc + x * x
            cnorms.append(math.sqrt(acc))
        cnorms_np = np.array(cnorms, dtype=np.float64)
        k_lens_np = np.array(k_lens, dtype=np.int64)

        def _assign(it, _c=cents_np, _cn=cnorms_np, _cl=k_lens_np):
            # vectorized across rows (per vector length group), but
            # accumulated DIMENSION BY DIMENSION so every dot and norm is
            # the exact left-to-right IEEE fold the SQL
            # aggregate(zip_with(...)) formulation computed — assignments
            # are bit-identical (guide §4.2: Spark distributes, numpy does
            # the batch math). A zero-norm (dead) or length-mismatched
            # centroid is excluded outright: in the SQL form its cosine
            # was NULL (division by zero / zip_with null padding), and
            # NULL sorts below every value in a struct-max, so such a cell
            # could never win.
            import pandas as pd

            kk = _c.shape[0]
            for pdf in it:
                if len(pdf) == 0:
                    continue
                lens = pdf["v"].str.len().to_numpy()
                cell = np.zeros(len(pdf), dtype=np.int32)
                for L in np.unique(lens):
                    sel = lens == L
                    V = np.array(pdf.loc[sel, "v"].tolist(), dtype=np.float64)
                    accn = np.zeros(len(V))
                    for j in range(int(L)):
                        accn = accn + V[:, j] * V[:, j]
                    nv = np.sqrt(accn)
                    cos = np.full((kk, len(V)), -np.inf)
                    for ci in range(kk):
                        if _cn[ci] == 0.0 or _cl[ci] != L:
                            continue
                        accd = np.zeros(len(V))
                        for j in range(int(L)):
                            accd = accd + V[:, j] * _c[ci, j]
                        cos[ci] = accd / (nv * _cn[ci])
                    # argmax down the cell axis: first max wins = lowest
                    # cell, the same (cos DESC, cell ASC) tie rule as the
                    # struct-max
                    cell[sel] = np.argmax(cos, axis=0).astype(np.int32)
                yield pd.DataFrame({"cell": cell, "v": pdf["v"]})

        assigned = vecs.mapInPandas(_assign, schema="cell int, v array<double>")
        dims = assigned.select("cell", F.posexplode("v").alias("dim", "x"))
        new_vals = dims.groupBy("cell", "dim").agg(
            F.round(F.avg("x"), 6).alias("val")
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in new_vals.collect():
            by_cell.setdefault(r["cell"], {})[r["dim"]] = r["val"]
        for ci in range(k):
            # empty cells keep their previous centroid; a cell's new
            # length tracks its members' (posexplode emits exactly the
            # dims present, contiguously from 0)
            if ci in by_cell:
                cents_vals[ci] = [by_cell[ci][d] for d in sorted(by_cell[ci])]
    return spark.createDataFrame(
        [
            (ci, d, float(x))
            for ci in range(k)
            for d, x in enumerate(cents_vals[ci])
        ],
        "cell int, dim int, val double",
    )
