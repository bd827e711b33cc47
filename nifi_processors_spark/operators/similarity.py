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
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .fuzzy import cosine


def _partial_topk(scored: DataFrame, query_id: str, k: int) -> DataFrame:
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact cosine top-k per query. queries must be small (broadcast)."""
    q = F.broadcast(queries.select(query_id_col, query_vec_col))
    scored = (
        vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v"))
        .crossJoin(q)
        .withColumn("cosine", cosine(F.col("_v"), F.col(query_vec_col)))
        .select(query_id_col, "vec_id", "cosine")
    )
    return _partial_topk(scored, query_id_col, k).select(query_id_col, "vec_id", "cosine", "rank")


def assign_cells(
    vectors: DataFrame,
    n_cells: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, DataFrame]:
    """Pick n_cells deterministic centroids (hash-sampled rows) and assign
    every vector to its nearest centroid (by cosine). Returns
    (assigned_vectors(vec_id, embedding, cell), centroids(cell, centroid))."""
    centroids = (
        vectors.select(F.col(id_col).alias("_cid"), F.col(vec_col).alias("centroid"))
        .orderBy(F.xxhash64(F.col("_cid").cast("string")))
        .limit(n_cells)
        .withColumn("cell", F.row_number().over(Window.orderBy("_cid")) - 1)
        .select("cell", "centroid")
    )
    c = F.broadcast(centroids)
    scored = (
        vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"))
        .crossJoin(c)
        .withColumn("_sim", cosine(F.col("embedding"), F.col("centroid")))
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("_sim").desc(), F.col("cell"))
    assigned = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("vec_id", "embedding", "cell")
    )
    return assigned, centroids


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
    of the corpus ever again. Centroids live in a `_centroids` subdir."""
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
    )
    vectors = spark.read.parquet(f"{path}/vectors")
    scored = (
        vectors.join(F.broadcast(probes), "cell")
        .withColumn("cosine", cosine(F.col("embedding"), F.col(query_vec_col)))
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
    )
    scored = (
        assigned.join(F.broadcast(probes), "cell")
        .withColumn("cosine", cosine(F.col("embedding"), F.col(query_vec_col)))
        .select(query_id_col, "vec_id", "cosine")
    )
    return _partial_topk(scored, query_id_col, k).select(query_id_col, "vec_id", "cosine", "rank")
