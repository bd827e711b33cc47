"""Lloyd's k-means centroid training for IVF (operators/similarity.py):
planted clusters separate perfectly, the quantizer monotonically
improves over the hash-picked init, and trained centroids plug into the
persisted-index path."""

import math

import pytest
from pyspark.sql import functions as F

from nifi_processors_spark.operators import similarity


def _planted(spark, per_cluster=30, dim=8):
    """Three well-separated prototypes with small deterministic jitter."""
    protos = [
        [1.0] * (dim // 2) + [0.0] * (dim // 2),
        [0.0] * (dim // 2) + [1.0] * (dim // 2),
        [1.0, -1.0] * (dim // 2),
    ]
    rows = []
    vid = 0
    for ci, p in enumerate(protos):
        for j in range(per_cluster):
            jit = [((vid * 31 + d * 7 + j) % 13 - 6) / 100.0 for d in range(dim)]
            rows.append((vid, ci, [p[d] + jit[d] for d in range(dim)]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, truth int, embedding array<double>")


def _avg_sim(df, cents):
    """Mean cosine of each vector to its assigned centroid — the
    spherical-k-means objective."""
    staged = similarity._stage_norm(
        df.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding")),
        "embedding",
    )
    best = F.array_max(F.array(*[
        F.aggregate(
            F.zip_with("embedding", F.array(*[F.lit(float(x)) for x in cv]),
                       lambda x, y: x * y),
            F.lit(0.0), lambda a, y: a + y,
        ) / (F.col("_vnorm") * math.sqrt(sum(x * x for x in cv)))
        for _, cv in cents
    ]))
    return staged.agg(F.avg(best)).first()[0]


def test_planted_clusters_pure(spark):
    df = _planted(spark)
    cents = similarity.train_centroids_kmeans(df, n_cells=3, n_iters=5)
    assigned, _ = similarity.assign_cells(df, 3, centroids=cents)
    pur = (
        assigned.join(df.select("vec_id", "truth"), "vec_id")
        .groupBy("truth").agg(F.countDistinct("cell").alias("c"),
                              F.count(F.lit(1)).alias("n"))
        .collect()
    )
    # every planted cluster maps to exactly one cell
    assert all(r["c"] == 1 and r["n"] == 30 for r in pur)
    # and the three cells are distinct
    assert assigned.select("cell").distinct().count() == 3


def test_training_improves_quantizer(spark):
    df = _planted(spark)
    init = similarity.pick_centroids(df, 3)
    trained = similarity.train_centroids_kmeans(df, n_cells=3, n_iters=5)
    assert _avg_sim(df, trained) >= _avg_sim(df, init) - 1e-12


def test_deterministic(spark):
    df = _planted(spark)
    a = similarity.train_centroids_kmeans(df, n_cells=3, n_iters=3)
    b = similarity.train_centroids_kmeans(df, n_cells=3, n_iters=3)
    assert a == b


def test_trained_centroids_drive_index(spark, tmp_path):
    df = _planted(spark)
    cents = similarity.train_centroids_kmeans(df, n_cells=3, n_iters=4)
    assigned, centroids_df = similarity.assign_cells(df, 3, centroids=cents)
    path = str(tmp_path / "ivf")
    assigned.write.mode("overwrite").partitionBy("cell").parquet(f"{path}/vectors")
    centroids_df.write.mode("overwrite").parquet(f"{path}/_centroids")
    q = df.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    # nprobe=1 on perfectly separated clusters: top hits are same-cluster
    out = similarity.ivf_topk_indexed(spark, path, q, k=5, nprobe=1).collect()
    assert len(out) == 5 and all(r["vec_id"] < 30 for r in out)


def test_empty_cells_keep_centroids(spark):
    # more cells than natural clusters: training must not crash or drop
    # cells, and every input still lands somewhere
    df = _planted(spark, per_cluster=10)
    cents = similarity.train_centroids_kmeans(df, n_cells=8, n_iters=3)
    assert len(cents) == 8 and [c for c, _ in cents] == list(range(8))
    assigned, _ = similarity.assign_cells(df, 8, centroids=cents)
    assert assigned.count() == 30
