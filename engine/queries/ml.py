"""Distributed ML primitives for the training-data pipeline.

Lloyd's k-means over the embeddings table — the workhorse behind
corpus clustering (topic balancing, dedup-by-cluster, IVF codebook
training; q_sim_ivf_topk runs exactly one of these steps inline).

Scale design (the shape that survives 100 TB):
- centroids are BROADCAST each iteration (k x d doubles — index-sized),
  never joined;
- assignment is one Arrow-batched GEMM per partition (mapInPandas);
- the centroid update emits ONE partial row per (partition, cluster)
  — k x d scaled-integer sums combined inside the Arrow batch — so
  the shuffle per iteration is #partitions x k tiny rows, not n x d;
- every driver-side collect is k rows (the codebook itself).

Determinism: accumulation runs in scaled BIGINT (1e6 fixed-point, the
engine's cross-engine convention), so centroid updates are exact and
identical under ANY partitioning of the input — the iteration count
is fixed, hence the whole trajectory is reproducible bit-for-bit.
Iterative and engine-defined, so the key is rows-only by design
(like LSH/IVF); quality is pinned in tests/test_ml.py instead
(monotone inertia descent + partition invariance).
"""
from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load_tables
from ..registry import query
from .util import rnd

K = 8
ITERS = 4
_SCALE = 1_000_000  # fixed-point: 1e6 steps per unit


def _lloyd(spark, sf, k: int = K, iters: int = ITERS):
    """Run Lloyd's algorithm; returns (assignments DataFrame, which
    carries vec_id -> cluster plus the squared distance, computed
    against the FINAL centroids)."""
    import numpy as np
    import pandas as pd

    # measured and deliberately NOT spread: the per-iteration Arrow
    # GEMM repeats 5x, so a round-robin exchange repeats 5x too — a
    # same-session A/B measured it as a clear loss (more Python task
    # overhead than GEMM parallelism gained; OPTIMIZATION_r15.md)
    e = load_tables(spark, sf)["embeddings"].select("vec_id", "embedding")

    # Forgy init, deterministic: the k lowest vec_ids
    seeds = [
        np.asarray(r.embedding, dtype=np.float64)
        for r in e.orderBy("vec_id").limit(k).collect()
    ]
    cents = np.stack(seeds)

    sc = spark.sparkContext
    for _ in range(iters):
        cb = sc.broadcast(cents)

        def partials(batches):
            C = cb.value
            kk, d = C.shape
            for pdf in batches:
                M = np.stack(pdf.embedding.to_numpy()).astype(np.float64)
                # squared euclidean via the expansion; argmin per row
                d2 = ((M * M).sum(1)[:, None] - 2.0 * (M @ C.T)
                      + (C * C).sum(1)[None, :])
                a = np.argmin(d2, axis=1)
                Mi = np.floor(M * _SCALE + 0.5).astype(np.int64)
                rows = []
                for c in np.unique(a):
                    sel = Mi[a == c]
                    rows.append((int(c), int(sel.shape[0]),
                                 sel.sum(0, dtype=np.int64).tolist()))
                yield pd.DataFrame(rows, columns=["c", "n", "s"])

        part = e.mapInPandas(partials, "c int, n long, s array<long>")
        # ONE shuffle to the k x d grain, collected directly (<= k*d
        # index-sized rows); the former second groupBy that re-packed
        # the components into sorted arrays was a whole extra
        # exchange per iteration just to prettify a k-row collect
        agg = (part.select("c", "n", F.posexplode("s").alias("i", "v"))
               .groupBy("c", "i")
               .agg(F.sum("n").alias("n"), F.sum("v").alias("v"))
               .collect())  # k x d rows — the codebook update
        # n is summed per (c, i) (equal across i for a cluster); the
        # fixed-point mean is exact integer arithmetic before ONE div
        new = cents.copy()
        for r in agg:
            new[r.c][r.i] = r.v / (r.n * float(_SCALE))
        cb.destroy()
        cents = new

    fb = sc.broadcast(cents)

    def assign(batches):
        C = fb.value
        for pdf in batches:
            M = np.stack(pdf.embedding.to_numpy()).astype(np.float64)
            d2 = ((M * M).sum(1)[:, None] - 2.0 * (M @ C.T)
                  + (C * C).sum(1)[None, :])
            a = np.argmin(d2, axis=1)
            yield pd.DataFrame({
                "vec_id": pdf.vec_id,
                "cluster": a.astype(np.int32),
                "d2": d2[np.arange(len(a)), a],
            })

    return e.mapInPandas(assign, "vec_id long, cluster int, d2 double")


@query("q_cluster_kmeans")  # rows-only: iterative, engine-defined
def q_cluster_kmeans(spark, sf):
    """K-means corpus clustering (k=8, 4 Lloyd iterations): per-cluster
    size and inertia against the final codebook.  See the module
    docstring for the 100 TB shape; the per-iteration shuffle is
    partitions x k partial rows and every collect is k-sized."""
    asg = _lloyd(spark, sf)
    # inertia accumulated in scaled BIGINT: exact under any partitioning
    return (asg.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n"),
                 (F.sum(F.floor(F.col("d2") * 10000 + F.lit(0.5))
                        .cast("long")) / 10000.0).alias("inertia"))
            .select("cluster", "n", rnd(F.col("inertia"), 4).alias("inertia")))
