"""Similarity search over an embedding column (array<float>).

Two paths, same results contract (top-k neighbors per query):

  * ``brute_force_topk`` — exact: broadcast the (small) query set against
    every vector, cosine via zip_with/aggregate (JVM-side), window top-k.
    The right baseline; at 100 TB it is one scan + one broadcast join —
    no shuffle of the big side at all until the final per-query top-k
    (which AQE keeps tiny because rows were pre-filtered to k per
    partition via partial top-k).
  * ``ivf_topk`` — approximate: IVF-style coarse quantizer. Centroids are
    picked deterministically (hash-sampled vectors), every vector is
    assigned to its nearest centroid once (one scan), queries probe only
    the ``nprobe`` nearest centroid cells. At scale the cell assignment is
    the partition key, so a query touches a fraction of the data.

Cell assignment is a PURE PROJECTION (round 5): centroids are a
driver-side list (they are ``limit(n_cells)`` by construction), embedded
as literal arrays, and the nearest cell is an expression argmax —
``array_max`` over per-centroid ``struct(sim, -cell)`` — so the corpus is
NEVER shuffled to find its cells. The previous shape (crossJoin with the
broadcast centroids + ``row_number`` over ``Window.partitionBy(vec_id)``)
paid a full exchange of every vector on a unique key just to compute a
per-row argmax — at 100 TB that is the difference between one narrow
scan and re-shuffling the entire corpus.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .fuzzy import cosine


def _partial_topk(scored: DataFrame, query_id: str, k: int) -> DataFrame:
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _norm(v: Column) -> Column:
    """||v|| with the same left-fold association as fuzzy.cosine — staged
    variants must produce bit-identical floats."""
    return F.sqrt(
        F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda acc, y: acc + y)
    )


def _staged_cosine(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """fuzzy.cosine with the two norms PRE-STAGED as bound columns.

    The inline form re-aggregates both norms twice per pair (guard +
    denominator): for an n-vector x m-query score that is 4 extra array
    folds per pair. Staging ||v|| once per vector row and ||q|| once per
    query row leaves only the dot product as per-pair work (~6x less
    arithmetic, r06). Same expressions, same fold order, same guard —
    bit-identical results."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact cosine top-k per query. queries must be small (broadcast).

    Norms are staged per side (``_staged_cosine``): the scan computes
    ||v|| once per vector, the broadcast side carries ||q|| once per
    query, and the per-pair work is just the dot product."""
    q = F.broadcast(
        queries.select(query_id_col, query_vec_col)
        .withColumn("_qnorm", _norm(F.col(query_vec_col)))
    )
    scored = (
        vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v"))
        .withColumn("_vnorm", _norm(F.col("_v")))
        .crossJoin(q)
        .withColumn(
            "cosine",
            _staged_cosine(
                F.col("_v"), F.col(query_vec_col), F.col("_vnorm"), F.col("_qnorm")
            ),
        )
        .select(query_id_col, "vec_id", "cosine")
    )
    return _partial_topk(scored, query_id_col, k).select(query_id_col, "vec_id", "cosine", "rank")


def pick_centroids(
    vectors: DataFrame,
    n_cells: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[tuple[int, list[float]]]:
    """Deterministic centroid pick: the n_cells rows with the smallest
    ``xxhash64(id)`` (a seedless uniform sample), numbered 0..n-1 in
    ascending id order. One tiny job — O(n_cells) rows to the driver,
    which is exactly the size a coarse-quantizer codebook must be (it is
    broadcast to every probe anyway)."""
    rows = (
        vectors.select(
            F.col(id_col).alias("_cid"),
            F.col(vec_col).cast("array<double>").alias("centroid"),
        )
        .orderBy(F.xxhash64(F.col("_cid").cast("string")))
        .limit(n_cells)
        .collect()
    )
    rows.sort(key=lambda r: r["_cid"])
    return [(cell, list(r["centroid"])) for cell, r in enumerate(rows)]


def train_centroids_kmeans(
    vectors: DataFrame,
    n_cells: int = 16,
    n_iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[tuple[int, list[float]]]:
    """Lloyd's k-means refinement of the IVF centroids, DataFrame-only.

    Init is the deterministic hash pick (``pick_centroids``); each round
    (a) assigns every vector with the SAME zero-shuffle expression argmax
    the index uses and (b) recomputes each cell's mean in ONE map-side-
    combinable aggregation — n_cells groups × dim sum columns, so the
    shuffle is a few KB regardless of corpus size, and the driver holds
    n_cells × dim floats per round. No UDFs, no cached intermediates;
    cost is n_iters narrow scans. Empty cells keep their previous
    centroid (deterministic; no re-seeding randomness). Cosine assignment
    is scale-invariant, so the un-normalized mean is a valid spherical
    k-means update.

    Deterministic end to end: same data + params -> same centroids, so a
    rebuilt index is byte-stable. Returns the same ``(cell, centroid)``
    list shape ``assign_cells``/``build_ivf_index`` accept."""
    cents = pick_centroids(vectors, n_cells, vec_col, id_col)
    staged = _stage_norm(
        vectors.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("embedding"),
        ),
        "embedding",
    )
    dim = len(cents[0][1])
    for _ in range(n_iters):
        rows = (
            staged.withColumn("_cell", nearest_cell_expr(cents, "embedding"))
            .groupBy("_cell")
            .agg(
                F.count(F.lit(1)).alias("_n"),
                *[
                    F.sum(F.element_at("embedding", i + 1)).alias(f"_s{i}")
                    for i in range(dim)
                ],
            )
        ).collect()
        by_cell = {r["_cell"]: r for r in rows}
        cents = [
            (cell, [by_cell[cell][f"_s{i}"] / by_cell[cell]["_n"] for i in range(dim)])
            if cell in by_cell and by_cell[cell]["_n"]
            else (cell, old)
            for cell, old in cents
        ]
    return cents


def nearest_cell_expr(
    centroids: list[tuple[int, list[float]]], vec_col: str = "embedding"
) -> Column:
    """Expression-only argmax over literal centroids: for each centroid,
    ``struct(cosine, -cell)``; ``array_max`` picks best cosine, lowest
    cell on ties (same order as the former window's ``_sim DESC, cell``).
    Zero shuffle — the whole assignment is one narrow projection. The
    query-side norm is staged once (``_stage_norm``) and each centroid's
    norm is a driver-side constant, so the per-row cost is n_cells dot
    products, not n_cells full cosines."""
    v = F.col(vec_col)
    na = F.col("_vnorm")
    cands = []
    for cell, cvec in centroids:
        lit_c = F.array(*[F.lit(float(x)) for x in cvec])
        dot = F.aggregate(
            F.zip_with(v, lit_c, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, y: acc + y,
        )
        nb = math.sqrt(sum(x * x for x in cvec))  # same left-fold order as fuzzy.cosine
        sim = (
            F.when((na > 0) & F.lit(nb > 0), dot / (na * F.lit(nb))).otherwise(F.lit(0.0))
        )
        cands.append(F.struct(sim.alias("s"), F.lit(-cell).alias("negcell")))
    return -F.array_max(F.array(*cands))["negcell"]


def _stage_norm(vectors: DataFrame, vec_col: str) -> DataFrame:
    """Stage ||v|| as a real column BEFORE the per-centroid expressions —
    a lambda-captured subexpression would re-evaluate per centroid (no
    CSE inside HOFs)."""
    v = F.col(vec_col)
    na = F.sqrt(
        F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda acc, y: acc + y)
    )
    return vectors.withColumn("_vnorm", na)


def assign_cells(
    vectors: DataFrame,
    n_cells: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: list[tuple[int, list[float]]] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Pick n_cells deterministic centroids (hash-sampled rows) and assign
    every vector to its nearest centroid (by cosine) with a pure
    projection — no shuffle of the corpus. Returns
    (assigned_vectors(vec_id, embedding, cell), centroids(cell, centroid))."""
    cents = centroids if centroids is not None else pick_centroids(
        vectors, n_cells, vec_col, id_col
    )
    assigned = _stage_norm(
        vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")),
        "embedding",
    ).select(
        "vec_id",
        "embedding",
        nearest_cell_expr(cents, "embedding").alias("cell"),
    )
    spark = vectors.sparkSession
    centroids_df = spark.createDataFrame(
        [(c, v) for c, v in cents], "cell int, centroid array<double>"
    )
    return assigned, centroids_df


def build_ivf_index(
    vectors: DataFrame,
    path: str,
    n_cells: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Persist an IVF index: vectors assigned to their nearest centroid,
    written as parquet PARTITIONED BY cell (write once, query many — the
    100 TB path). A probe then reads only its nprobe cell directories:
    partition pruning turns each query into a fractional scan, no shuffle
    of the corpus ever again (the assignment itself is a projection, so
    the index build is scan -> project -> partitioned write, zero
    exchanges). Centroids live in a `_centroids` subdir."""
    assigned, centroids = assign_cells(vectors, n_cells, vec_col, id_col)
    assigned.write.mode("overwrite").partitionBy("cell").parquet(f"{path}/vectors")
    centroids.write.mode("overwrite").parquet(f"{path}/_centroids")


def ivf_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k against a persisted IVF index. The cell filter is
    an IN-list on the partition column, so the scan prunes to the probed
    cell directories (`PartitionFilters` in explain) — cost scales with
    nprobe/n_cells of the corpus, not its size."""
    centroids = spark.read.parquet(f"{path}/_centroids")
    c = F.broadcast(centroids)
    q_scored = (
        queries.select(query_id_col, query_vec_col)
        .crossJoin(c)
        .withColumn("_sim", cosine(F.col(query_vec_col), F.col("centroid")))
    )
    wq = Window.partitionBy(query_id_col).orderBy(F.col("_sim").desc(), F.col("cell"))
    probes = (
        q_scored.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select(query_id_col, query_vec_col, "cell")
        .withColumn("_qnorm", _norm(F.col(query_vec_col)))
    )
    vectors = spark.read.parquet(f"{path}/vectors")
    scored = (
        vectors.withColumn("_vn", _norm(F.col("embedding")))
        .join(F.broadcast(probes), "cell")
        .withColumn(
            "cosine",
            _staged_cosine(
                F.col("embedding"), F.col(query_vec_col), F.col("_vn"), F.col("_qnorm")
            ),
        )
        .select(query_id_col, "vec_id", "cosine")
    )
    return _partial_topk(scored, query_id_col, k).select(query_id_col, "vec_id", "cosine", "rank")


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate cosine top-k: probe only the nprobe nearest cells.

    At scale, persist ``assigned`` partitioned by cell (write once, query
    many); here assignment happens inline for self-contained usage.
    """
    assigned, centroids = assign_cells(vectors, n_cells, vec_col, id_col)
    c = F.broadcast(centroids)
    q_scored = (
        queries.select(query_id_col, query_vec_col)
        .crossJoin(c)
        .withColumn("_sim", cosine(F.col(query_vec_col), F.col("centroid")))
    )
    wq = Window.partitionBy(query_id_col).orderBy(F.col("_sim").desc(), F.col("cell"))
    probes = (
        q_scored.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select(query_id_col, query_vec_col, "cell")
        .withColumn("_qnorm", _norm(F.col(query_vec_col)))
    )
    scored = (
        assigned.withColumn("_vn", _norm(F.col("embedding")))
        .join(F.broadcast(probes), "cell")
        .withColumn(
            "cosine",
            _staged_cosine(
                F.col("embedding"), F.col(query_vec_col), F.col("_vn"), F.col("_qnorm")
            ),
        )
        .select(query_id_col, "vec_id", "cosine")
    )
    return _partial_topk(scored, query_id_col, k).select(query_id_col, "vec_id", "cosine", "rank")
