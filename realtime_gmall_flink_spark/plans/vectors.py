"""Similarity search over the ``embeddings`` table (array<float>, dim 64).

Brute-force cosine top-k is the correctness baseline; a deterministic
sign-LSH bucketing is the scale path (candidate generation becomes an
equi-join on an 8-bit bucket id, cutting the pair space ~256x; at 100 TB
you'd use more bits + multi-probe).

Parity: all arithmetic is double, folded left-to-right in array order in
both engines (Spark aggregate/zip_with vs DuckDB list_sum over
list_transform), so results are bit-identical; ordering ties are broken by
vec_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..functions.similarity import cosine_similarity, sign_lsh_bucket
from ..sources.testdata import load_table
from .catalog import register

QUERY_VEC_ID = 0
TOP_K = 10

# dot(a,b), ||a||, ||b|| as sequential double folds (dim is 64).
_DOT = (
    "list_sum(list_transform(generate_series(1, 64),"
    " i -> CAST(embedding[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)))"
)
_NORM_A = (
    "sqrt(list_sum(list_transform(generate_series(1, 64),"
    " i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))"
)
_NORM_Q = (
    "sqrt(list_sum(list_transform(generate_series(1, 64),"
    " i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE))))"
)
_COS = f"{_DOT} / ({_NORM_A} * {_NORM_Q})"

_BUCKET_SQL = " + ".join(
    f"(CASE WHEN embedding[{2 * i + 1}] > embedding[{2 * i + 2}]"
    f" THEN {1 << i} ELSE 0 END)"
    for i in range(8)
)


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    # single-row-group file + CPU-bound per-row folds: spread across cores
    # (see plans.textops._docs for rationale)
    target = spark.sparkContext.defaultParallelism
    if emb.rdd.getNumPartitions() < target:
        emb = emb.repartition(target)
    return emb


# ---------------------------------------------------------------------------
# brute-force cosine top-k for one query vector
@register(
    "ann_cosine_topk",
    survey="J5(ext)",
    headline=True,
    oracle=f"""
WITH q AS (
    SELECT embedding AS qe FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
)
SELECT vec_id, round({_COS}, 6) AS cos_sim
FROM embeddings, q
WHERE vec_id <> {QUERY_VEC_ID}
ORDER BY round({_COS}, 6) DESC, vec_id
LIMIT {TOP_K}
""",
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qe")
    )
    cos = cosine_similarity(F.col("embedding"), F.col("qe"))
    return (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(broadcast(q))
        .select("vec_id", F.round(cos, 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(TOP_K)
    )


# ---------------------------------------------------------------------------
# sign-LSH bucket histogram (the partition layout of the scale path)
@register(
    "lsh_bucket_stats",
    survey="A3(ext)",
    oracle=f"""
SELECT CAST({_BUCKET_SQL} AS INTEGER) AS bucket, count(*) AS vec_ct
FROM embeddings
GROUP BY 1
""",
)
def lsh_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    return (
        emb.select(
            sign_lsh_bucket(F.col("embedding"), bits=8)
            .cast("int")
            .alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("vec_ct"))
    )


# ---------------------------------------------------------------------------
# per-label corpus stats. Cross-row sums of irrational norms would be
# addition-order-dependent; rounding each per-row norm to 6 decimals and
# summing in DECIMAL makes the aggregate order-free and oracle-exact.
@register(
    "embedding_label_stats",
    survey="A4(ext)",
    oracle=f"""
SELECT label,
       count(*) AS vec_ct,
       CAST(SUM(CAST(round({_NORM_A}, 6)
                     AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_norm
FROM embeddings
GROUP BY label
""",
)
def embedding_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.similarity import l2_norm

    emb = _emb(spark, sf_dir)
    norm6 = F.round(l2_norm(F.col("embedding")), 6).cast("decimal(18,6)")
    return (
        emb.select("label", norm6.alias("__n"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("vec_ct"),
            (F.sum("__n").cast("double") / F.count(F.lit(1))).alias(
                "avg_norm"
            ),
        )
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup PAIRS: LSH-bucketed candidate generation, exact
# cosine verification within buckets. Recall is bounded by the bucketing
# (similar vectors usually share sign patterns; multi-probe widens recall
# at scale) — the oracle computes the same bucketed semantics.
COSINE_DUP_THRESHOLD = 0.4

_COS_AB = (
    "list_sum(list_transform(generate_series(1, 64),"
    " i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))"
    " / (sqrt(list_sum(list_transform(generate_series(1, 64),"
    " i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))"
    " * sqrt(list_sum(list_transform(generate_series(1, 64),"
    " i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))))"
)


@register(
    "near_dup_embedding_pairs",
    survey="J5(ext),J6(ext)",
    oracle=f"""
WITH bk AS (
    SELECT vec_id, embedding, CAST({_BUCKET_SQL} AS INTEGER) AS bucket
    FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round({_COS_AB}, 6) AS cos_sim
FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {_COS_AB} >= {COSINE_DUP_THRESHOLD}
""",
)
def near_dup_embedding_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir).withColumn(
        "bucket", sign_lsh_bucket(F.col("embedding"), bits=8).cast("int")
    )
    a = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        "bucket",
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        F.col("bucket").alias("bucket_b"),
    )
    cos = cosine_similarity(F.col("ea"), F.col("eb"))
    return (
        a.join(
            b,
            (F.col("bucket") == F.col("bucket_b"))
            & (F.col("vec_a") < F.col("vec_b")),
        )
        .withColumn("__cos", cos)
        .filter(F.col("__cos") >= COSINE_DUP_THRESHOLD)
        .select("vec_a", "vec_b", F.round("__cos", 6).alias("cos_sim"))
    )


# ---------------------------------------------------------------------------
# bucketed ANN: exact cosine only within the query vector's LSH bucket
@register(
    "ann_lsh_topk",
    survey="J5(ext),J6(ext)",
    oracle=f"""
WITH b AS (
    SELECT vec_id, embedding,
           CAST({_BUCKET_SQL} AS INTEGER) AS bucket
    FROM embeddings
), q AS (
    SELECT embedding AS qe, bucket AS qbucket FROM b
    WHERE vec_id = {QUERY_VEC_ID}
)
SELECT vec_id, round({_COS}, 6) AS cos_sim
FROM b, q
WHERE b.bucket = q.qbucket AND vec_id <> {QUERY_VEC_ID}
ORDER BY round({_COS}, 6) DESC, vec_id
LIMIT {TOP_K}
""",
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir).withColumn(
        "bucket", sign_lsh_bucket(F.col("embedding"), bits=8).cast("int")
    )
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qe"), F.col("bucket").alias("qbucket")
    )
    cos = cosine_similarity(F.col("embedding"), F.col("qe"))
    return (
        emb.crossJoin(broadcast(q))
        .filter(
            (F.col("bucket") == F.col("qbucket"))
            & (F.col("vec_id") != QUERY_VEC_ID)
        )
        .select("vec_id", F.round(cos, 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(TOP_K)
    )
