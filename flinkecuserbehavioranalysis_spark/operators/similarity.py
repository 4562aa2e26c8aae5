"""Vector similarity search over embedding columns (extension).

Embeddings are ``array<float>`` columns; all math is JVM-side Catalyst
(``zip_with`` + ``aggregate`` higher-order functions — whole-stage
codegen, no Python in the hot path).  Cosines are rounded to 6 dp at the
output boundary so cross-engine comparisons (and rank ties) are stable.

Two strategies:

- **brute-force top-k** — broadcast the (small) query set against the
  corpus; exact, linear scan per query.  The right baseline, and the
  verifier for approximate variants.
- **bucketed (IVF/LSH-style)** — restrict candidate pairs to a coarse
  bucket (here the precomputed ``label`` cluster id; in production a
  trained coarse quantizer or random-hyperplane LSH).  Join shuffles on
  the bucket id → linear-ish in corpus + intra-bucket pairs, the only
  shape that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product — deterministic summation order."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k per query vector.

    *queries* should be small (it is broadcast); the corpus scan is
    embarrassingly parallel.  Returns (q_id, neighbor_id, cos) ranked
    desc with neighbor_id tiebreak; self-matches excluded."""
    from pyspark.sql import Window

    # norms are precomputed per vector, not per pair — at corpus scale the
    # pair count dwarfs the vector count, so this is a 3x flop reduction
    # (sqrt(dot(x,x)) is the same double either way → oracle still matches)
    q = queries.select(
        F.col(query_id_col).alias("q_id"),
        _as_double(vec_col).alias("q_vec"),
    ).withColumn("q_norm", F.sqrt(dot(F.col("q_vec"), F.col("q_vec"))))
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("v_vec")
    ).withColumn("v_norm", F.sqrt(dot(F.col("v_vec"), F.col("v_vec"))))
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("q_id"))
        .select(
            "q_id",
            "neighbor_id",
            F.round(
                dot(F.col("q_vec"), F.col("v_vec")) / (F.col("q_norm") * F.col("v_norm")), 6
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("q_id", "neighbor_id", "cos", "rnk")
    )


def bucketed_neardup_pairs(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "label",
    threshold: float = 0.35,
) -> DataFrame:
    """IVF-style near-duplicate pairs: cosine ≥ *threshold* within a
    coarse bucket.  Returns (vec_a, vec_b, bucket, cos), vec_a < vec_b.

    The equi-join on the bucket id is the scale lever: all-pairs cosine
    is O(n²); bucketed is Σ_b |b|² with |b| ≪ n.  Recall is bounded by
    bucket quality — pair with a multi-probe assignment for higher
    recall at the same cost shape."""
    def side(tag: str) -> DataFrame:
        return vectors.select(
            F.col(id_col).alias(f"vec_{tag}"),
            F.col(bucket_col).alias(f"bucket_{tag}"),
            _as_double(vec_col).alias(f"v_{tag}"),
        ).withColumn(f"norm_{tag}", F.sqrt(dot(F.col(f"v_{tag}"), F.col(f"v_{tag}"))))

    a, b = side("a"), side("b")
    return (
        a.join(
            b,
            (F.col("bucket_a") == F.col("bucket_b")) & (F.col("vec_a") < F.col("vec_b")),
        )
        .select(
            "vec_a",
            "vec_b",
            F.col("bucket_a").alias("bucket"),
            F.round(
                dot(F.col("v_a"), F.col("v_b")) / (F.col("norm_a") * F.col("norm_b")), 6
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    n_cells: int = 16,
    nprobe: int = 3,
    k: int = 10,
) -> DataFrame:
    """IVF-Flat approximate top-k: the scale path for similarity search.

    Coarse quantizer = the *n_cells* vectors with the smallest ids — a
    deterministic stand-in for a trained k-means codebook (swap in
    trained centroids in production; the plan shape is identical).
    Every corpus vector is assigned to its nearest cell (one broadcast
    of the tiny codebook, linear scan); each query probes its *nprobe*
    nearest cells and scores only those cells' members.

    Cost shape: assignment is MAP-ONLY — the codebook rides along as one
    broadcast array row and each vector folds over it to find its
    nearest cell (no explode, no per-vector shuffle; the corpus-side
    window-rank formulation would re-shuffle every vector).  Candidate
    scoring shuffles on the cell id — Σ_probed |cell| pairs instead of
    the brute-force O(n·q).  Recall < 1 by construction; verify against
    ``brute_force_topk`` on samples.  Output: (q_id, neighbor_id, cos,
    rnk) — same schema as the exact baseline."""
    from pyspark.sql import Window

    seeds = (
        vectors.orderBy(F.col(id_col))
        .limit(n_cells)
        .select(F.col(id_col).alias("seed_id"), _as_double(vec_col).alias("s_vec"))
        .withColumn("s_norm", F.sqrt(dot(F.col("s_vec"), F.col("s_vec"))))
    )
    # the whole codebook as ONE array<struct> row (sorted by seed_id —
    # ties in the fold below resolve to the smallest seed id)
    packed = seeds.select(F.struct("seed_id", "s_vec", "s_norm").alias("s")).agg(
        F.array_sort(F.collect_list("s")).alias("cells")
    )

    def scos(vec: str, norm: str, s) -> Column:
        return F.round(dot(F.col(vec), s.s_vec) / (F.col(norm) * s.s_norm), 6)

    def best_cell(vec: str, norm: str) -> Column:
        """Map-side argmax over the packed codebook: fold keeping the
        strictly-greater cosine, so the first (lowest seed_id) wins ties
        — identical to ORDER BY cos DESC, seed_id."""
        init = F.struct(
            F.lit(-2.0).cast("double").alias("c"), F.lit(-1).cast("bigint").alias("id")
        )
        folded = F.aggregate(
            F.col("cells"),
            init,
            lambda acc, s: F.when(
                scos(vec, norm, s) > acc.c,
                F.struct(scos(vec, norm, s).alias("c"), s.seed_id.alias("id")),
            ).otherwise(acc),
        )
        return folded.id

    v = (
        vectors.select(F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("v_vec"))
        .withColumn("v_norm", F.sqrt(dot(F.col("v_vec"), F.col("v_vec"))))
    )
    q = (
        queries.select(F.col(query_id_col).alias("q_id"), _as_double(vec_col).alias("q_vec"))
        .withColumn("q_norm", F.sqrt(dot(F.col("q_vec"), F.col("q_vec"))))
    )
    assigned = (
        v.crossJoin(F.broadcast(packed))
        .select("neighbor_id", "v_vec", "v_norm", best_cell("v_vec", "v_norm").alias("cell"))
    )
    # probes need the nprobe best cells — explode + rank, but only over
    # the (small) query set
    q_scored = (
        q.crossJoin(F.broadcast(seeds))
        .select(
            "q_id",
            "q_vec",
            "q_norm",
            F.col("seed_id").alias("cell"),
            scos("q_vec", "q_norm", F.struct(F.col("seed_id"), F.col("s_vec"), F.col("s_norm"))).alias("s_cos"),
        )
    )
    wq = Window.partitionBy("q_id").orderBy(F.col("s_cos").desc(), F.col("cell").asc())
    probes = (
        q_scored.withColumn("__r", F.row_number().over(wq))
        .filter(F.col("__r") <= nprobe)
        .select("q_id", "q_vec", "q_norm", "cell")
    )
    scored = (
        assigned.join(probes, "cell")
        .filter(F.col("neighbor_id") != F.col("q_id"))
        .select(
            "q_id",
            "neighbor_id",
            F.round(
                dot(F.col("q_vec"), F.col("v_vec")) / (F.col("q_norm") * F.col("v_norm")), 6
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("q_id", "neighbor_id", "cos", "rnk")
    )


def label_centroids(
    vectors: DataFrame,
    bucket_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-bucket centroid components: mean of each embedding dimension
    (long format: bucket, pos, centroid_val, n_vecs).

    The distributed vector-mean shape: ``posexplode`` runs map-side, the
    single shuffle groups on (bucket, dim) — n_buckets × dim groups
    regardless of corpus size.  Component sums go through DECIMAL so the
    result is summation-order independent (float sums are not), then the
    mean is rounded at the output boundary.  This is the aggregation an
    IVF coarse-quantizer training step runs per k-means iteration."""
    e = vectors.select(
        F.col(bucket_col), F.posexplode(_as_double(vec_col)).alias("pos", "v")
    )
    return e.groupBy(bucket_col, "pos").agg(
        F.round(
            F.sum(F.col("v").cast("decimal(28,12)")).cast("double") / F.count(F.lit(1)), 6
        ).alias("centroid_val"),
        F.count(F.lit(1)).alias("n_vecs"),
    )
