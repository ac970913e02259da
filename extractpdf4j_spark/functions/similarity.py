"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline; the scale path is
LSH-bucketed search with deterministic random hyperplanes. Dot products
use native higher-order functions (zip_with + aggregate → JVM, sequential
fold, no Python).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def cosine_topk(embeddings: DataFrame, query_id: int, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact brute-force cosine top-k against one stored vector.
    The single-row query side is broadcast; ties break on id."""
    e = embeddings.select(F.col(id_col), _as_double(F.col(vec_col)).alias("emb"))
    q = (e.filter(F.col(id_col) == query_id)
         .select(F.col("emb").alias("qemb")))
    j = e.crossJoin(F.broadcast(q))
    cos = _dot(F.col("emb"), F.col("qemb")) / (
        F.sqrt(_dot(F.col("emb"), F.col("emb")))
        * F.sqrt(_dot(F.col("qemb"), F.col("qemb"))))
    return (j.select(id_col, F.round(cos, 6).alias("cosine"))
            .orderBy(F.col("cosine").desc(), F.col(id_col))
            .limit(k))


def knn_join(embeddings: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             qid_col: str = "query_id") -> DataFrame:
    """Top-k neighbors for EVERY query vector (broadcast the query side,
    per-query window top-k). Exact; O(N*Q) — the LSH variant below is the
    candidate-pruned version for large Q."""
    e = embeddings.select(F.col(id_col), _as_double(F.col(vec_col)).alias("emb"))
    q = queries.select(F.col(qid_col), _as_double(F.col(vec_col)).alias("qemb"))
    j = e.crossJoin(F.broadcast(q))
    cos = _dot(F.col("emb"), F.col("qemb")) / (
        F.sqrt(_dot(F.col("emb"), F.col("emb")))
        * F.sqrt(_dot(F.col("qemb"), F.col("qemb"))))
    j = j.select(qid_col, id_col, F.round(cos, 6).alias("cosine"))
    w = Window.partitionBy(qid_col).orderBy(F.col("cosine").desc(),
                                            F.col(id_col))
    return (j.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def _hyperplanes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic ±1 hyperplanes from md5 — reproducible across runs
    and engines, no RNG state to ship."""
    planes = []
    for p in range(n_planes):
        comps = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()
            comps.append(1.0 if int(h[:2], 16) % 2 == 0 else -1.0)
        planes.append(comps)
    return planes


def lsh_bucket(vec_col, n_planes: int, dim: int, seed: int = 42):
    """Bucket id = sign bits of the vector against n_planes hyperplanes
    (native expressions over literal plane arrays)."""
    planes = _hyperplanes(n_planes, dim, seed)
    bucket = F.lit(0).cast("long")
    for p, comps in enumerate(planes):
        plane = F.array(*[F.lit(c) for c in comps])
        bit = (_dot(vec_col, plane) >= 0).cast("long")
        bucket = bucket + bit * (1 << p)
    return bucket


def embedding_near_duplicates(embeddings: DataFrame, threshold: float = 0.95,
                              n_tables: int = 2, n_planes: int = 8,
                              dim: int = 64, id_col: str = "vec_id",
                              vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidates share a
    hyperplane bucket in ANY of ``n_tables`` independent hash tables
    (seeded deterministically), verified by exact cosine >= threshold.

    Scale shape: candidate generation is an equi-join on (table_id,
    bucket) — never all-pairs; more tables buy recall linearly in
    shuffle volume. Returns (a, b, cosine) with a < b, cosine rounded
    to 6dp."""
    e = embeddings.select(F.col(id_col),
                          _as_double(F.col(vec_col)).alias("emb"))
    buckets = [
        F.struct(F.lit(t).alias("table_id"),
                 lsh_bucket(F.col("emb"), n_planes, dim,
                            seed=42 + t).alias("bucket"))
        for t in range(n_tables)
    ]
    banded = (e.select(F.col(id_col), F.explode(F.array(*buckets))
                       .alias("b"))
              .select(id_col, "b.table_id", "b.bucket"))
    a = banded.select("table_id", "bucket", F.col(id_col).alias("a"))
    b = banded.select("table_id", "bucket", F.col(id_col).alias("b"))
    pairs = (a.join(b, ["table_id", "bucket"])
             .filter(F.col("a") < F.col("b"))
             .select("a", "b").distinct())
    ea = e.select(F.col(id_col).alias("a"), F.col("emb").alias("ea"))
    eb = e.select(F.col(id_col).alias("b"), F.col("emb").alias("eb"))
    j = pairs.join(ea, "a").join(eb, "b")
    cos = _dot(F.col("ea"), F.col("eb")) / (
        F.sqrt(_dot(F.col("ea"), F.col("ea")))
        * F.sqrt(_dot(F.col("eb"), F.col("eb"))))
    return (j.select("a", "b", F.round(cos, 6).alias("cosine"))
            .filter(F.col("cosine") >= threshold))


def _ivf_centroids(n_clusters: int, dim: int, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-centroids with md5-derived components in
    [-1, 1) — stands in for the sampled k-means a production build runs
    driver-side; same contract (K fixed dim-d vectors broadcast to every
    task), reproducible across runs and engines."""
    cents = []
    for c in range(n_clusters):
        comps = []
        for d in range(dim):
            h = hashlib.md5(f"ivf:{seed}:{c}:{d}".encode()).hexdigest()
            comps.append(float(int(h[:8], 16)) / float(2 ** 32) * 2.0 - 1.0)
        cents.append(comps)
    return cents


def ivf_train_centroids(embeddings: DataFrame, n_clusters: int = 8,
                        seed: int = 7, sample_n: int = 2048,
                        iters: int = 10, id_col: str = "vec_id",
                        vec_col: str = "embedding") -> list[list[float]]:
    """Driver-side sampled spherical k-means — the FAISS-style IVF train
    step that replaces the md5 pseudo-centroids with data-derived ones.

    This is the one deliberate driver-side collect in the package, and it
    is BOUNDED: ``sample_n`` rows regardless of table size (deterministic
    md5-order sample, so the same seed yields the same centroids on any
    partitioning) — at 100 TB the sample is still ``sample_n`` vectors.
    Vectors are L2-normalized so Lloyd assignment under dot product
    matches the engine's cosine assignment. Returns K centroid lists to
    pass as ``centroids=`` to :func:`ivf_assign`/:func:`ivf_topk`, where
    they are inlined as plan literals exactly like the pseudo-centroid
    path (broadcast in the plan, no shuffle).
    """
    import numpy as np

    e = embeddings.select(F.col(id_col).alias("i"),
                          _as_double(F.col(vec_col)).alias("emb"))
    samp = (e.orderBy(F.md5(F.concat_ws(":", F.lit(str(seed)),
                                        F.col("i").cast("string"))))
            .limit(sample_n).select("emb").toPandas())
    X = np.asarray(samp["emb"].tolist(), dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(n_clusters, len(X)),
                     replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(len(C)):
            members = X[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 1e-12:
                    C[c] = v / n
    return C.tolist()


def ivf_assign(embeddings: DataFrame, n_clusters: int = 8, dim: int = 64,
               seed: int = 7, id_col: str = "vec_id",
               vec_col: str = "embedding",
               centroids: list[list[float]] | None = None) -> DataFrame:
    """Assign every vector to its nearest (max-cosine) centroid.

    The centroid set is a literal array broadcast inside the plan (no
    shuffle to distribute it), and the argmax is SHUFFLE-FREE: an
    array_max over (cosine, -cid) structs evaluated per row — struct
    ordering gives max cosine with min-cid tie-break (matching the
    oracle's ORDER BY ccos DESC, cid), and no exchange touches the
    10^12-row side. At 100 TB the cluster column is written once and the
    table is partitioned/bucketed by it, so probes become partition
    pruning — this function is the build step of that layout.

    ``centroids`` (e.g. from :func:`ivf_train_centroids`) overrides the
    deterministic md5 pseudo-centroids; the pseudo path remains the
    oracle-gate surface (reproducible across engines without k-means)."""
    cents = centroids if centroids is not None \
        else _ivf_centroids(n_clusters, dim, seed)
    e = embeddings.select(F.col(id_col),
                          _as_double(F.col(vec_col)).alias("emb"))

    def ccos(comps):
        cvec = F.array(*[F.lit(v) for v in comps])
        return _dot(F.col("emb"), cvec) / (
            F.sqrt(_dot(F.col("emb"), F.col("emb")))
            * F.sqrt(_dot(cvec, cvec)))

    best = F.array_max(F.array(*[
        F.struct(ccos(comps).alias("c"),
                 F.lit(-c).cast("long").alias("negcid"))
        for c, comps in enumerate(cents)]))
    return e.select(id_col, "emb", (-best["negcid"]).alias("cluster"))


def ivf_topk(embeddings: DataFrame, query_id: int, k: int = 10,
             nprobe: int = 2, n_clusters: int = 8, dim: int = 64,
             seed: int = 7, id_col: str = "vec_id",
             vec_col: str = "embedding",
             centroids: list[list[float]] | None = None) -> DataFrame:
    """IVF approximate cosine top-k: exact search restricted to the
    ``nprobe`` clusters nearest the query vector.

    Scale shape: candidates come from an equi-join on the cluster id
    (partition pruning once the table is laid out by cluster), never a
    full scan; the query side (1 row) and its probe list (nprobe rows)
    are broadcast."""
    assigned = ivf_assign(embeddings, n_clusters, dim, seed, id_col,
                          vec_col, centroids=centroids)
    cents = centroids if centroids is not None \
        else _ivf_centroids(n_clusters, dim, seed)
    q = (assigned.filter(F.col(id_col) == query_id)
         .select(F.col("emb").alias("qemb")))
    cent_arr = F.array(*[
        F.struct(F.lit(c).cast("long").alias("cid"),
                 F.array(*[F.lit(v) for v in comps]).alias("cvec"))
        for c, comps in enumerate(cents)])
    probes = (q.select("qemb", F.explode(cent_arr).alias("c"))
              .select("qemb", F.col("c.cid").alias("pcid"),
                      (_dot(F.col("qemb"), F.col("c.cvec"))
                       / (F.sqrt(_dot(F.col("qemb"), F.col("qemb")))
                          * F.sqrt(_dot(F.col("c.cvec"), F.col("c.cvec")))))
                      .alias("pcos"))
              .orderBy(F.col("pcos").desc(), F.col("pcid"))
              .limit(nprobe)
              .select("qemb", "pcid"))
    cand = assigned.join(F.broadcast(probes),
                         assigned["cluster"] == probes["pcid"])
    cos = _dot(F.col("emb"), F.col("qemb")) / (
        F.sqrt(_dot(F.col("emb"), F.col("emb")))
        * F.sqrt(_dot(F.col("qemb"), F.col("qemb"))))
    return (cand.select(id_col, "cluster", F.round(cos, 6).alias("cosine"))
            .orderBy(F.col("cosine").desc(), F.col(id_col))
            .limit(k))


def lsh_bucketed_topk(embeddings: DataFrame, query_id: int, k: int = 10,
                      n_planes: int = 8, dim: int = 64,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Approximate cosine top-k: candidates share the query's hyperplane
    bucket; exact cosine within the bucket.

    At 100 TB the bucket column is precomputed and the table is
    partitioned/bucketed by it, turning the probe into partition pruning;
    here we compute it on the fly.
    """
    e = embeddings.select(F.col(id_col),
                          _as_double(F.col(vec_col)).alias("emb"))
    e = e.withColumn("bucket", lsh_bucket(F.col("emb"), n_planes, dim))
    q = (e.filter(F.col(id_col) == query_id)
         .select(F.col("emb").alias("qemb"), F.col("bucket").alias("qbucket")))
    j = e.join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
    cos = _dot(F.col("emb"), F.col("qemb")) / (
        F.sqrt(_dot(F.col("emb"), F.col("emb")))
        * F.sqrt(_dot(F.col("qemb"), F.col("qemb"))))
    return (j.select(id_col, F.round(cos, 6).alias("cosine"))
            .orderBy(F.col("cosine").desc(), F.col(id_col))
            .limit(k))


# ---------------------------------------------------------------------------
# int8 scalar quantization (the 100 TB bandwidth lever for the ANN family)
# ---------------------------------------------------------------------------

def quantize_embeddings(embeddings: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Per-vector symmetric int8 scalar quantization: scale =
    max(|v|)/127 (guarded for zero vectors), q_i = floor(v_i/scale + 0.5)
    clamped to [-127, 127].

    The quantizer is defined as floor(x + 0.5) — one IEEE expression both
    engines evaluate identically — rather than a locale of round-half
    conventions, so it is exactly reproducible in the DuckDB oracle.
    At scale this is what makes brute-force rerank and IVF probe lists
    cheap: 4x less scan bandwidth and shuffle volume than float32, 8x
    less than the float64 compute type, with cosine error bounded by the
    per-vector scale. All codegen — no UDF, no shuffle (pure projection).
    """
    emb = _as_double(F.col(vec_col))
    scale = F.greatest(
        F.array_max(F.transform(emb, lambda x: F.abs(x))) / F.lit(127.0),
        F.lit(1e-30))
    staged = embeddings.select(F.col(id_col), emb.alias("emb"),
                               scale.alias("scale"))
    qv = F.transform(
        F.col("emb"), lambda x: F.least(F.greatest(
            F.floor(x / F.col("scale") + F.lit(0.5)), F.lit(-127.0)),
            F.lit(127.0)).cast("long"))
    return staged.select(id_col, "scale", qv.alias("qvec"))


def quantized_cosine_topk(embeddings: DataFrame, query_id: int,
                          k: int = 10, id_col: str = "vec_id",
                          vec_col: str = "embedding") -> DataFrame:
    """Brute-force cosine top-k over the QUANTIZED representation —
    cosine of the dequantized vectors (per-vector scales cancel in the
    normalized dot product, so the int8 arrays are used directly)."""
    q8 = quantize_embeddings(embeddings, id_col, vec_col)
    e = q8.select(F.col(id_col),
                  F.transform("qvec", lambda x: x.cast("double"))
                  .alias("emb"))
    qside = (e.filter(F.col(id_col) == query_id)
             .select(F.col("emb").alias("qemb")))
    j = e.crossJoin(F.broadcast(qside))
    cos = _dot(F.col("emb"), F.col("qemb")) / (
        F.sqrt(_dot(F.col("emb"), F.col("emb")))
        * F.sqrt(_dot(F.col("qemb"), F.col("qemb"))))
    return (j.select(id_col, F.round(cos, 6).alias("cosine"))
            .orderBy(F.col("cosine").desc(), F.col(id_col))
            .limit(k))
