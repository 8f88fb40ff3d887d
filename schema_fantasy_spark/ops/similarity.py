"""Similarity search over an embedding column (array<float>).

* brute-force cosine top-k — the exactness baseline: one broadcast of the
  query vector, one pass, JVM-side dot product via zip_with/aggregate,
  top-k by a single ORDER BY LIMIT (Spark executes TakeOrderedAndProject —
  no full sort, no shuffle of vectors).
* LSH-bucketed ANN — the scale path: random-hyperplane signatures
  (deterministic from a seed), candidates share a signature prefix in any
  of several bands; rerank candidates exactly. At 10^12 vectors the
  bucket join shuffles only (bucket, id) pairs.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int = 5,
) -> DataFrame:
    """Exact top-k by cosine similarity to a literal query vector.

    ``round_to`` stabilizes cross-engine float comparison; ties broken by
    id for full determinism.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sims = df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col).cast("array<double>"), q), round_to).alias("cosine_sim"),
    )
    return sims.orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc()).limit(k)


def _hyperplane(dim: int, seed: int, plane: int) -> List[float]:
    """Deterministic pseudo-random unit-free hyperplane: components from a
    splitmix-style integer hash mapped to [-1, 1). Reproducible everywhere,
    no RNG state."""
    comps = []
    for d in range(dim):
        x = (seed * 0x9E3779B97F4A7C15 + plane * 0xBF58476D1CE4E5B9 + d * 0x94D049BB133111EB) & ((1 << 64) - 1)
        x ^= x >> 31
        x = (x * 0xD6E8FEB86659FD93) & ((1 << 64) - 1)
        x ^= x >> 27
        comps.append((x / float(1 << 64)) * 2.0 - 1.0)
    return comps


def rp_signature(vec: Column, dim: int, n_planes: int = 16, seed: int = 42) -> Column:
    """Random-hyperplane (SimHash-for-vectors) bit signature as int: bit p
    = sign(vec . hyperplane_p)."""
    bits = []
    for p in range(n_planes):
        h = _hyperplane(dim, seed, p)
        plane = F.array(*[F.lit(c) for c in h])
        bits.append(
            F.when(dot(vec.cast("array<double>"), plane) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")  # long: n_planes up to 63 without overflow


def ann_lsh_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    round_to: int = 5,
) -> DataFrame:
    """Approximate top-k: candidates = vectors sharing any signature band
    with the query; exact cosine rerank on candidates only.

    Recall/cost dial: more bands -> higher recall, more candidates.
    """
    from schema_fantasy_spark.ops.dedup import _barrier, _ensure_parallelism

    dim = len(query_vec)
    bits_per_band = n_planes // bands
    # Generate-barrier: the band-match filter references sig once per band;
    # without the barrier CollapseProject re-inlines the full 16-plane
    # dot-product tree into every band predicate
    with_sig = _barrier(
        _ensure_parallelism(df.select(F.col(id_col), F.col(vec_col)), keys=(id_col,)),
        rp_signature(F.col(vec_col), dim, n_planes, seed),
        "sig",
    )

    # query signature computed driver-side with identical arithmetic
    qsig = 0
    for p in range(n_planes):
        h = _hyperplane(dim, seed, p)
        if sum(a * b for a, b in zip(query_vec, h)) >= 0:
            qsig |= 1 << p
    mask = (1 << bits_per_band) - 1
    band_match = None
    for b in range(bands):
        qband = (qsig >> (b * bits_per_band)) & mask
        cond = (
            F.shiftright(F.col("sig"), b * bits_per_band).bitwiseAND(F.lit(mask))
            == qband
        )
        band_match = cond if band_match is None else (band_match | cond)
    candidates = with_sig.filter(band_match)

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sims = candidates.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col).cast("array<double>"), q), round_to).alias("cosine_sim"),
    )
    return sims.orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc()).limit(k)


def ivf_index(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_lists: int = 16,
    seed: int = 42,
    max_iter: int = 10,
    train_sample: int = 4096,
    assign_partitions: Optional[int] = None,
):
    """IVF (inverted-file) index: k-means centroids + per-vector list
    assignment. Returns (assigned_df, centroids) where assigned_df carries
    a ``list_id`` column and centroids is a small driver-side list.

    Scale shape: FAISS-style — centroids train on a bounded deterministic
    hash-ordered SAMPLE driver-side (numpy; one TakeOrderedAndProject
    collect, no per-iteration cluster jobs), then assignment is one argmin
    over n_lists literal centroids per row. The assigned table is the
    persisted index (``ivf_write``), partitioned by list_id so probes
    read only the probed lists (partition pruning).
    """
    import numpy as np

    # deterministic UNBIASED sample: top-K by xxhash64(id) is a random
    # permutation prefix (an id-prefix would train on one temporal/source
    # slice of a real crawl), and TakeOrderedAndProject keeps it one
    # cheap per-partition top-K pass at any scale
    rows = (
        df.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .limit(train_sample)
        .collect()
    )
    X = np.array([list(r[vec_col]) for r in rows], dtype=np.float64)
    k = min(n_lists, len(X))
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), size=k, replace=False)].copy()
    for _ in range(max_iter):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        labels = d2.argmin(axis=1)
        for j in range(k):
            pts = X[labels == j]
            if len(pts):
                C[j] = pts.mean(axis=0)  # empty cluster keeps its centroid
    centroids = [list(map(float, c)) for c in C]

    from schema_fantasy_spark.ops.dedup import _barrier

    # HOF folds evaluate interpreted (outside codegen): with a single
    # input split the whole argmin lands in one task. Adaptive: repartition
    # only when the scan has fewer partitions than cores (never at scale);
    # assign_partitions forces an explicit count.
    from schema_fantasy_spark.ops.dedup import _ensure_parallelism

    if assign_partitions:
        df = df.repartition(assign_partitions)
    else:
        df = _ensure_parallelism(df)
    # Generate barrier: downstream stages (partitionBy shuffle + write)
    # reference list_id repeatedly; without the barrier each reference
    # re-evaluates the full n_lists x dim distance computation
    assigned = _barrier(
        df, _nearest_centroid_expr(F.col(vec_col), centroids), "list_id"
    )
    return assigned, centroids


def quantize_pow2_expr(vec: Column, scale: int) -> Column:
    """Half-up quantization with a POWER-OF-TWO scale: floor(x*S + 0.5)
    per element. float32 -> double is exact, *2^k is exact, +0.5 is
    exact at these magnitudes — so the quantized integers are
    bit-identical across engines (Spark, DuckDB, numpy), which is what
    makes the integer-exact IVF training below replayable as a pure-SQL
    oracle."""
    return F.transform(
        vec.cast("array<double>"),
        lambda x: F.floor(x * F.lit(float(scale)) + F.lit(0.5)).cast("long"),
    )


def ivf_index_exact(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_lists: int = 16,
    max_iter: int = 10,
    train_sample: int = 4096,
    scale: int = 1 << 20,
    assign_partitions: Optional[int] = None,
):
    """REPRODUCIBLE IVF training: the same index bits from any engine,
    any partitioning, any cluster size — every arithmetic step is
    integer-exact and order-independent, so a 10^12-vector index build
    that dies mid-way resumes to a bit-identical result, and a DuckDB
    oracle can replay the whole build in SQL (the ivf_partial_probe
    gate does exactly that).

    Differences from the float ``ivf_index`` (FAISS-style, the default
    path, still the right choice when reproducibility across engines is
    not required):

    * training sample + init: ordered by portable ``md5(str(id))``
      instead of xxhash64 (same unbiased-permutation-prefix argument;
      md5 exists everywhere), init centroids = first ``n_lists`` of
      that order instead of an RNG draw;
    * vectors quantized once via :func:`quantize_pow2_expr`;
    * Lloyd iterations in pure integer arithmetic: squared-L2 in int,
      argmin ties to the lowest list, centroid update = floor-division
      integer mean (order-independent — float means depend on summation
      order and cannot be replayed cross-engine); empty lists keep
      their centroid.

    Returns (assigned_df, centroids) with INTEGER centroid components
    (exact in array<double> storage up to 2^53, so ``ivf_write`` /
    ``ivf_read`` round-trip them unchanged).
    """
    rows = (
        df.select(F.col(id_col), quantize_pow2_expr(F.col(vec_col), scale).alias("qv"))
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(train_sample)
        .collect()
    )
    X = [[int(v) for v in r["qv"]] for r in rows]  # python ints: exact
    k = min(n_lists, len(X))
    C = [list(X[j]) for j in range(k)]
    for _ in range(max_iter):
        sums = [[0] * len(C[0]) for _ in range(k)]
        counts = [0] * k
        for v in X:
            best, bd = 0, None
            for j, c in enumerate(C):
                d = sum((a - b) * (a - b) for a, b in zip(v, c))
                if bd is None or d < bd:
                    bd, best = d, j
            counts[best] += 1
            sums[best] = [s + a for s, a in zip(sums[best], v)]
        for j in range(k):
            if counts[j]:
                # floor division == SQL floor(sum/count): exact for
                # |sum| < 2^53 regardless of sign conventions
                C[j] = [s // counts[j] for s in sums[j]]
    centroids = [[float(x) for x in c] for c in C]

    from schema_fantasy_spark.ops.dedup import _barrier, _ensure_parallelism

    if assign_partitions:
        df = df.repartition(assign_partitions)
    else:
        df = _ensure_parallelism(df)
    qcol = quantize_pow2_expr(F.col(vec_col), scale)
    assigned = _barrier(df, _nearest_centroid_expr_int(qcol, C), "list_id")
    return assigned, centroids


def _nearest_centroid_expr_int(qvec: Column, centroids_int) -> Column:
    """Integer argmin over literal integer centroids (exact arithmetic
    twin of ``_nearest_centroid_expr``; ties resolve to the first =
    lowest list)."""
    dists = []
    for c in centroids_int:
        lit_c = F.array(*[F.lit(int(x)) for x in c])
        d = F.aggregate(
            F.zip_with(qvec, lit_c, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        dists.append(d)
    darr = F.array(*dists)
    return (F.array_position(darr, F.array_min(darr)) - 1).cast("int")


def _nearest_centroid_expr(vec: Column, centroids) -> Column:
    """argmin over literal centroids of squared L2 distance — unrolled,
    JVM-side (centroid count is a compile-time constant).

    Shaped as array_position(d, array_min(d)) so each distance fold
    appears twice, not once per when-branch plus once inside every
    branch's least() (which re-evaluated ~n_lists^2 folds per row in the
    interpreted write path)."""
    dists = []
    for c in centroids:
        lit_c = F.array(*[F.lit(x) for x in c])
        d = F.aggregate(
            F.zip_with(vec.cast("array<double>"), lit_c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        dists.append(d)
    darr = F.array(*dists)
    # array_position is 1-based; ties resolve to the first (lowest) list,
    # matching the previous when-chain order
    return (F.array_position(darr, F.array_min(darr)) - 1).cast("int")


def ivf_write(assigned: DataFrame, centroids, index_dir: str) -> None:
    """Persist an IVF index: the assigned table written
    ``partitionBy('list_id')`` — probes then read ONLY the probed lists'
    files (partition pruning, asserted in tests/test_plan_audit.py) —
    plus a tiny centroids table. Build once, probe many."""
    # cluster writers by list: without this every task writes a file into
    # every list_id directory (tasks x lists tiny files + commit overhead;
    # measured 7s -> 1s at sf0.1). At 10^12 vectors raise numPartitions to
    # keep per-file size in the GB range — still grouped by list.
    n_lists = len(centroids)
    (
        assigned.repartition(n_lists, "list_id")
        .write.mode("overwrite")
        .partitionBy("list_id")
        .parquet(index_dir + "/lists")
    )
    spark = assigned.sparkSession
    # single-slice parallelize -> one file; a coalesce(1) on a local
    # relation pathologically cost 4-6s per write in this Spark build
    spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(i, [float(x) for x in c]) for i, c in enumerate(centroids)], 1
        ),
        "list_id int, centroid array<double>",
    ).write.mode("overwrite").parquet(index_dir + "/centroids")


def ivf_read(spark, index_dir: str):
    """Load a persisted IVF index -> (assigned_df, centroids). The
    assigned frame is partition-pruned when filtered on list_id."""
    rows = spark.read.parquet(index_dir + "/centroids").collect()
    centroids = [list(r["centroid"]) for r in sorted(rows, key=lambda r: r["list_id"])]
    assigned = spark.read.parquet(index_dir + "/lists")
    return assigned, centroids


def ivf_topk(
    assigned: DataFrame,
    centroids,
    query_vec,
    k: int,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int = 5,
    exact_scale: Optional[int] = None,
) -> DataFrame:
    """IVF probe: rank centroids by distance to the query (driver-side,
    n_lists floats), scan only the ``n_probe`` nearest lists, exact cosine
    rerank within them. With a list_id-partitioned index this prunes
    (1 - n_probe/n_lists) of the data before any scan.

    With ``exact_scale`` set (an ``ivf_index_exact`` index), probe
    selection runs in integer arithmetic with lowest-list tie-breaks —
    fully replayable by the SQL oracle."""
    q = [float(x) for x in query_vec]

    if exact_scale:
        qq = [math.floor(x * exact_scale + 0.5) for x in q]

        def dist2(c):
            return sum((a - int(b)) * (a - int(b)) for a, b in zip(qq, c))

    else:

        def dist2(c):
            return sum((a - b) * (a - b) for a, b in zip(q, c))

    probe = sorted(range(len(centroids)), key=lambda i: (dist2(centroids[i]), i))[
        :n_probe
    ]
    qcol = F.array(*[F.lit(x) for x in q])
    sims = (
        assigned.filter(F.col("list_id").isin(probe))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col).cast("array<double>"), qcol), round_to).alias(
                "cosine_sim"
            ),
        )
    )
    return sims.orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc()).limit(k)


def near_duplicates_by_embedding(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 32,
    bands: int = 4,
    seed: int = 42,
    round_to: int = 5,
    max_bucket: int = 64,
) -> DataFrame:
    """Embedding-cosine near-dup pairs: RP-LSH banding for candidates,
    exact cosine verification >= threshold. Shuffles (band, bucket, id).

    Bucket width is the scale dial: bits_per_band = n_planes/bands sets
    the random-pair candidate rate at ~bands/2^bits (4-bit buckets made
    ~25% of ALL pairs candidates — near-quadratic; the 8-bit default is
    ~1.6%, and 16-bit buckets at n_planes=64 reach ~0.006% for 10^9+
    corpora). Recall for true near-dups (cos >= 0.9) stays high because
    their per-bit agreement ~0.9 -> ~0.43/band at 8 bits.

    ``max_bucket`` guards the degenerate corpus (many zero or identical
    vectors collapse to ONE signature, making a single bucket quadratic):
    buckets larger than it are dropped before pair generation, the same
    fanout cap the minhash LSH path applies. Members of an over-cap
    bucket still pair through their OTHER bands unless those are
    degenerate too — i.e. the cap only suppresses the pathological
    all-alike mass."""
    dim_probe = None  # signature needs dim; take it from the first row lazily
    # Spark-side: compute signature per row (dim from array size is not
    # expressible for the hyperplane constants, so dim must be known)
    first = df.select(F.size(F.col(vec_col)).alias("d")).limit(1).collect()
    if not first:
        return df.sparkSession.createDataFrame(
            [], f"id_a long, id_b long, cosine_sim double"
        )
    dim = first[0]["d"]
    bits_per_band = n_planes // bands
    # Generate-barrier: without it CollapseProject inlines the 16-plane
    # signature computation into every band projection
    from schema_fantasy_spark.ops.dedup import _ensure_parallelism

    with_sig = _ensure_parallelism(df.select(F.col(id_col), F.col(vec_col)), keys=(id_col,)).select(
        "*",
        F.explode(F.array(rp_signature(F.col(vec_col), dim, n_planes, seed))).alias("sig"),
    )
    # band positions are compile-time constants: unroll (shiftright needs
    # a literal bit count). Banded table carries ONLY (id, band, bucket) —
    # the narrow shuffle; vectors join back for the rerank.
    banded = with_sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("sig"), b * bits_per_band)
                        .bitwiseAND(F.lit((1 << bits_per_band) - 1))
                        .alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    # one groupBy replaces the per-bucket self-join: collect ids per
    # (band, bucket), drop singleton AND over-cap buckets, explode the
    # in-bucket pairs. Pair dedup happens BEFORE fetching vectors
    # (distinct over float arrays shuffles and compares the vectors
    # themselves — measured 15.7s -> ~4s on 5k x 64-dim).
    sized = (
        banded.groupBy("band", "bucket")
        .agg(F.collect_list(id_col).alias("ids"), F.count(F.lit(1)).alias("n"))
        .filter((F.col("n") > 1) & (F.col("n") <= max_bucket))
    )
    pairs = (
        sized.select(
            F.explode(
                F.filter(
                    F.flatten(
                        F.transform(
                            F.col("ids"),
                            lambda x: F.transform(
                                F.col("ids"),
                                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                            ),
                        )
                    ),
                    lambda p: p["id_a"] < p["id_b"],
                )
            ).alias("p")
        )
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .distinct()
    )
    # r9: cast + norm PER ID, not per pair — candidates put each vector
    # in many pairs (bucket fanout), and the old per-pair cosine()
    # recomputed both norms every time; the join's exchange materializes
    # the per-id columns, so each norm folds exactly once per vector.
    # Arithmetic is unchanged (same dot/(norm*norm) tree over the same
    # doubles), so cosine_sim is bit-identical.
    va = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).cast("array<double>").alias("v_a"),
    ).select("*", norm(F.col("v_a")).alias("n_a"))
    vb = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).cast("array<double>").alias("v_b"),
    ).select("*", norm(F.col("v_b")).alias("n_b"))
    out = (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                dot(F.col("v_a"), F.col("v_b"))
                / (F.col("n_a") * F.col("n_b")),
                round_to,
            ).alias("cosine_sim"),
        )
    )
    return out.filter(F.col("cosine_sim") >= threshold)


# ------------------------------------------------------- int8 quantization


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Symmetric int8 quantization: per-vector scale = max(|x|)/127,
    element -> round(x/scale) in [-127, 127] — the 4x-smaller storage
    format for 10^12-row embedding tables (and the shape integer-SIMD
    rerankers consume). Rounding is away-from-zero on both engines, so
    the oracle replays it exactly.

    Returns (id, qvec array<int>, qscale double). Cosine between
    quantized vectors needs NO scale: cos(au, bv) == cos(u, v), so
    downstream similarity is exact-integer dot products.
    """
    from schema_fantasy_spark.ops.dedup import _barrier

    v = F.col(vec_col).cast("array<double>")
    scale = F.array_max(F.transform(v, F.abs)) / F.lit(127.0)
    # barrier: the scale (an O(dim) fold) must evaluate once per row, not
    # once per element of the quantize transform
    b = _barrier(df.select(id_col, vec_col), scale, "qscale")
    qv = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.when(F.col("qscale") == 0, F.lit(0))
        .otherwise(F.round(x / F.col("qscale"), 0))
        .cast("int"),
    )
    return b.select(F.col(id_col), qv.alias("qvec"), F.col("qscale"))


def quantized_cosine_topk(
    quantized: DataFrame,
    query_q: Sequence[int],
    k: int,
    id_col: str = "vec_id",
    round_to: int = 5,
) -> DataFrame:
    """Exact top-k by cosine over int8-quantized vectors: BIGINT dot
    products and norms (exact integer arithmetic — bit-reproducible on
    any engine), ONE double division at the end. Same
    TakeOrderedAndProject shape as the float path."""
    qq = F.array(*[F.lit(int(x)) for x in query_q])
    qv = F.col("qvec")
    num = F.aggregate(
        F.zip_with(qv, qq, lambda a, b: (a * b).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(
            F.transform(qv, lambda x: (x * x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).cast("double")
    )
    nb = F.sqrt(
        F.aggregate(
            F.transform(qq, lambda x: (x * x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).cast("double")
    )
    sims = quantized.select(
        F.col(id_col),
        F.round(num.cast("double") / (na * nb), round_to).alias("cosine_sim"),
    )
    return sims.orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc()).limit(k)


def quantize_vector_py(vec) -> list:
    """Driver-side replica of quantize_embeddings for a query vector
    (away-from-zero HALF_UP rounding, like Spark round() and DuckDB
    round()). Rounds via Decimal on the shortest repr of the double:
    floor(v + 0.5) would round UP for doubles just below .5 (e.g.
    0.49999999999999994 + 0.5 == 1.0 in IEEE754), diverging from both
    engines on pathological inputs."""
    from decimal import ROUND_HALF_UP, Decimal

    scale = max(abs(float(x)) for x in vec) / 127.0
    if scale == 0:
        return [0] * len(vec)

    def rnd(v: float) -> int:
        return int(Decimal(repr(v)).quantize(Decimal(1), rounding=ROUND_HALF_UP))

    return [rnd(float(x) / scale) for x in vec]
