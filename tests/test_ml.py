"""Quality + determinism pins for the k-means key (rows-only in the
driver, so the engine itself must prove the iteration works)."""
from __future__ import annotations

from engine.registry import QUERIES, load_all
from engine.queries import ml

load_all()

SF = "/root/testdata/sf0.001"


def _inertia(spark, iters):
    from pyspark.sql import functions as F

    asg = ml._lloyd(spark, SF, iters=iters)
    return asg.agg(F.sum("d2")).collect()[0][0]


def test_kmeans_inertia_descends(spark):
    # Lloyd's is monotone: more iterations never raise inertia
    i1 = _inertia(spark, 1)
    i4 = _inertia(spark, 4)
    assert i4 <= i1 + 1e-9, (i1, i4)


def test_kmeans_covers_all_vectors(spark):
    from pyspark.sql import functions as F

    out = QUERIES["q_cluster_kmeans"](spark, SF)
    total = out.agg(F.sum("n")).collect()[0][0]
    import duckdb
    n = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/embeddings.parquet'").fetchone()[0]
    assert total == n
    assert out.count() <= ml.K


def _rows(spark, parts):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        df = QUERIES["q_cluster_kmeans"](spark, SF)
        return sorted(tuple(r) for r in df.collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_kmeans_partition_invariance(spark):
    # fixed-point accumulation makes the whole trajectory exact:
    # same clusters, same inertia, regardless of partitioning
    assert _rows(spark, 5) == _rows(spark, 32)
