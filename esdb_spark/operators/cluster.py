"""Embedding clustering: spherical k-means as a first-class operator.

The reference engine has no clustering (its surface stops at ordered
scans — esdb.go, space.go); this is a north-star LLM-pipeline operator
(SURVEY §2.7): corpus topic bucketing, per-cluster mixture control,
semantic-dedup prefiltering, and the coarse quantizer behind IVF ANN
(``similarity.ann_topk_ivf`` shares these exact helpers).

Scale design (the IVF lessons, now shared):

- **Fit on a deterministic sample, never the corpus.** Lloyd's runs in
  numpy on a seeded-md5 hash-sample (≤ ``fit_sample`` rows collected):
  at 100 TB you fit centroids on ~100k vectors — a driver BLAS fit
  beats a distributed fit's per-iteration job overhead by orders of
  magnitude, and centroid quality converges with sample size long
  before that cap.
- **Assignment is one broadcast-GEMM argmax per Arrow batch** — the
  centroid matrix (k × dim, a few MB) broadcasts once; the corpus
  streams through ``mapInPandas`` with no shuffle at all. The returned
  plan is scan → project, so Catalyst still prunes and pushes down
  around it.
- **Spherical metric**: vectors and centroids are L2-normalized so
  cosine = dot — the standard choice for embedding spaces (direction
  carries the signal, magnitude is mostly length bias).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

from esdb_spark.functions import hash_sample_k


def kmeans_fit(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int,
    iters: int = 20,
    seed: int = 42,
    fit_sample: int = 100_000,
) -> np.ndarray:
    """Fit ``k`` spherical k-means centroids on a deterministic
    hash-sample of ``df`` (EAGER: runs the sample job now). Returns a
    row-normalized (k_eff, dim) float64 array; k_eff < k when the
    sample has fewer vectors. Zero vectors are excluded from the fit
    (no direction). Deterministic in (data, seed)."""
    if k <= 0:
        raise ValueError("kmeans_fit: k must be positive")
    # hash_sample_k, NOT a bare orderBy(...).limit(fit_sample): at
    # 100k > the 10k top-k threshold that's either a FULL GLOBAL SORT
    # (Spark 3 fallback) or partitions×100k heap-merge volume (Spark 4
    # TakeOrdered) — hash_sample_k pre-filters by digest prefix so
    # only a ~3×cap sliver is ever top-k'd
    sample_pd = (
        hash_sample_k(
            df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")),
            F.col("id"),
            fit_sample,
            str(seed),
        )
        .select("vec")
        .toPandas()
    )
    if len(sample_pd) == 0:
        raise ValueError("kmeans_fit: empty input")
    # NULL / ragged rows are excluded from the fit (np.array on an
    # inhomogeneous list raises — a corrupt row must not kill the fit);
    # the corpus dimension is the MODAL sample dimension, not the first
    # row's (a ragged first row would silently invert the filter)
    from collections import Counter

    vec_list = [v for v in sample_pd["vec"] if v is not None]
    if not vec_list:
        raise ValueError("kmeans_fit: no non-null vectors in sample")
    dims = Counter(len(v) for v in vec_list)
    dim = max(dims.items(), key=lambda kv: (kv[1], -kv[0]))[0]
    sm = np.array([v for v in vec_list if len(v) == dim], dtype=np.float64)
    norms = np.linalg.norm(sm, axis=1)
    sm = sm[norms > 0] / norms[norms > 0][:, None]
    if len(sm) == 0:
        raise ValueError("kmeans_fit: all sampled vectors are zero")
    rng = np.random.default_rng(seed)
    k_eff = min(k, len(sm))
    cent = sm[rng.choice(len(sm), size=k_eff, replace=False)]
    for _ in range(iters):
        assign = (sm @ cent.T).argmax(axis=1)
        new = np.vstack(
            [
                sm[assign == j].mean(axis=0) if (assign == j).any() else cent[j]
                for j in range(k_eff)
            ]
        )
        nn = np.linalg.norm(new, axis=1)
        new = np.where(
            nn[:, None] > 0, new / np.maximum(nn, 1e-12)[:, None], cent
        )
        if np.allclose(new, cent, atol=1e-9):
            cent = new
            break
        cent = new
    return cent


def kmeans_assign(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str,
    id_col: str,
    keep_vec: bool = False,
) -> DataFrame:
    """Assign every row to its nearest centroid: (id, cluster, sim)
    [+ vec when ``keep_vec``]. One broadcast-GEMM argmax per Arrow
    batch; no shuffle. Zero vectors assign by raw dot product (all
    sims 0 → cluster 0, sim 0.0); NULL or wrong-dimension vectors get
    NULL cluster/sim — corrupt rows among billions must degrade
    visibly, never fail the task."""
    import pandas as pd

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(np.asarray(centroids, dtype=np.float64))
    src = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    fields = [
        StructField("id", src.schema["id"].dataType),
        StructField("cluster", IntegerType()),
        StructField("sim", DoubleType()),
    ]
    if keep_vec:
        fields.append(StructField("vec", src.schema["vec"].dataType))

    def op(batches):
        cent = bc.value
        dim = cent.shape[1]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vecs = pdf["vec"]
            ok = vecs.map(
                lambda v: v is not None and len(v) == dim
            ).to_numpy(dtype=bool)
            cluster_out = np.full(len(pdf), np.nan)
            sim_out = np.full(len(pdf), np.nan)
            if ok.any():
                m = np.array(vecs[ok].tolist(), dtype=np.float64)
                nrm = np.linalg.norm(m, axis=1)
                nrm[nrm == 0.0] = 1.0
                sims = (m / nrm[:, None]) @ cent.T
                cells = sims.argmax(axis=1)
                cluster_out[ok] = cells
                sim_out[ok] = sims[np.arange(len(m)), cells]
            out = {
                "id": pdf["id"].to_numpy(),
                # float carrier so NaN→NULL survives Arrow; the schema
                # casts the valid values back to int
                "cluster": pd.array(
                    [None if np.isnan(c) else int(c) for c in cluster_out],
                    dtype="Int32",
                ),
                "sim": pd.array(
                    [None if np.isnan(s) else float(s) for s in sim_out],
                    dtype="Float64",
                ),
            }
            if keep_vec:
                out["vec"] = pdf["vec"].to_numpy()
            yield pd.DataFrame(out)

    return src.mapInPandas(op, StructType(fields))


def kmeans_cluster(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int,
    iters: int = 20,
    seed: int = 42,
    fit_sample: int = 100_000,
) -> DataFrame:
    """Fit + assign in one call (the common shape): (id, cluster, sim)
    for every input row. EAGER fit (sample job now), lazy assignment."""
    cent = kmeans_fit(df, vec_col, id_col, k, iters, seed, fit_sample)
    return kmeans_assign(df, cent, vec_col, id_col)


def cluster_stats(assigned: DataFrame) -> DataFrame:
    """Per-cluster rollup of a :func:`kmeans_assign` result:
    (cluster, n_vecs, avg_sim, min_sim) — pure codegen aggregation
    (map-side combined; output bounded by k). avg_sim is the spherical
    k-means objective per cluster — the number to watch when choosing
    k."""
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count("*").alias("n_vecs"),
            F.avg("sim").alias("avg_sim"),
            F.min("sim").alias("min_sim"),
        )
        .orderBy("cluster")
    )
