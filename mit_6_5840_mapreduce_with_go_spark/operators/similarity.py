"""Similarity search over the ``embeddings`` table: brute-force cosine
top-k (the correctness baseline) and an IVF-bucketed approximate variant
(the scale path).

No reference counterpart — north-star LLM-pipeline additions.

Scale design: brute-force is O(Q x N) — fine when the query set Q is
small and broadcast (the plan below broadcasts Q, so the N side never
shuffles). IVF cuts candidate N by the bucket fraction: assign every
vector to its nearest coarse centroid once (a narrow pass against a
broadcast centroid table), then probe only the query's bucket. All dot
products are JVM-side ``zip_with``/``aggregate`` folds — no Python in
the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.vector import dot, norm
from ..registry import query
from ..sources import load_table

TOP_K = 5
N_QUERIES = 10  # query set: vec_id < 10
CENTROID_STRIDE = 97  # coarse centroids: vec_id % 97 == 0 (deterministic stand-in
# for a k-means codebook; the plumbing — assignment + bucketed probe — is real)

DUCK_COS = "list_cosine_similarity(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"


@query(
    "sim_topk_bruteforce",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
               WHERE vec_id < {N_QUERIES}),
         c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
         scored AS (
           SELECT query_id, neighbor_id,
                  {DUCK_COS.format(a='qv', b='cv')} AS cos_raw
           FROM q JOIN c ON query_id <> neighbor_id)
    SELECT query_id, neighbor_id, rank, round(cos_raw, 4) AS cos_sim
    FROM (SELECT query_id, neighbor_id, cos_raw,
                 CAST(row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos_raw DESC, neighbor_id) AS INTEGER) AS rank
          FROM scored)
    WHERE rank <= {TOP_K}
    """,
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector. Queries are
    broadcast; candidates stream through one narrow stage + a per-query
    top-k window (k-row heap per partition under AQE)."""
    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    # Precompute each side's norm ONCE (cosine() would refold the query
    # norm for every candidate row — 3 array folds per pair instead of 1).
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        norm(F.col("embedding")).alias("qn"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        norm(F.col("embedding")).alias("cn"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_raw", dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_raw").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", F.round("cos_raw", 4).alias("cos_sim"))
    )


@query(
    "sim_topk_ivf",
    oracle=f"""
    WITH cent AS (SELECT vec_id AS centroid_id, embedding AS centv FROM embeddings
                  WHERE vec_id % {CENTROID_STRIDE} = 0),
         assign AS (
           SELECT vec_id, centroid_id FROM (
             SELECT e.vec_id, cent.centroid_id,
                    row_number() OVER (PARTITION BY e.vec_id
                      ORDER BY {DUCK_COS.format(a='e.embedding', b='cent.centv')} DESC,
                               cent.centroid_id) AS rn
             FROM embeddings e CROSS JOIN cent)
           WHERE rn = 1),
         q AS (SELECT e.vec_id AS query_id, e.embedding AS qv, a.centroid_id
               FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id
               WHERE e.vec_id < {N_QUERIES}),
         cand AS (SELECT e.vec_id AS neighbor_id, e.embedding AS cv, a.centroid_id
                  FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id),
         scored AS (
           SELECT query_id, neighbor_id,
                  {DUCK_COS.format(a='qv', b='cv')} AS cos_raw
           FROM q JOIN cand ON q.centroid_id = cand.centroid_id
                           AND query_id <> neighbor_id)
    SELECT query_id, neighbor_id, rank, round(cos_raw, 4) AS cos_sim
    FROM (SELECT query_id, neighbor_id, cos_raw,
                 CAST(row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos_raw DESC, neighbor_id) AS INTEGER) AS rank
          FROM scored)
    WHERE rank <= {TOP_K}
    """,
)
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) approximate top-k: assign every vector to its
    nearest coarse centroid (broadcast codebook, one narrow pass), then
    probe only the query's cell. Recall vs. brute force is measured in
    tests/test_similarity.py. At 100 TB the assignment is written once as
    a bucketed table and probes touch 1/n_cells of the data."""
    emb = load_table(spark, sf_dir, "embeddings", fan_out=True).withColumn(
        "nrm", norm(F.col("embedding"))
    )
    cent = emb.filter(F.col("vec_id") % CENTROID_STRIDE == 0).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centv"),
        F.col("nrm").alias("centn"),
    )
    # Argmax-cosine assignment as a HASH aggregate (max over a struct whose
    # leading fields are the sort key), not a row_number window: the window
    # formulation shuffles and sorts all n_cells*N scored rows, while the
    # struct-max collapses to one row per vector in the map-side partial, so
    # the exchange carries N rows whatever the codebook size.  Same idiom as
    # _km_assign in clusters.py; tie-break identical (max cos, then min id).
    assign = (
        emb.crossJoin(F.broadcast(cent))
        .withColumn(
            "cent_cos",
            dot(F.col("embedding"), F.col("centv")) / (F.col("nrm") * F.col("centn")),
        )
        .groupBy("vec_id")
        .agg(
            F.max(
                F.struct(
                    F.col("cent_cos").alias("cent_cos"),
                    (-F.col("centroid_id")).alias("neg_cid"),
                    F.col("centroid_id").alias("centroid_id"),
                    F.col("embedding").alias("embedding"),
                    F.col("nrm").alias("nrm"),
                )
            ).alias("b")
        )
        .select(
            "vec_id",
            F.col("b.embedding").alias("embedding"),
            F.col("b.nrm").alias("nrm"),
            F.col("b.centroid_id").alias("centroid_id"),
        )
    )
    q = assign.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("nrm").alias("qn"),
        "centroid_id",
    )
    cand = assign.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        F.col("nrm").alias("cn"),
        "centroid_id",
    )
    scored = (
        cand.join(F.broadcast(q), "centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos_raw", dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_raw").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", F.round("cos_raw", 4).alias("cos_sim"))
    )


@query(
    "sim_label_cohesion",
    oracle="""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings WHERE vec_id < 300)
    SELECT (a.label = b.label) AS same_label,
           count(*) AS n_pairs,
           round(avg(list_cosine_similarity(a.v, b.v)), 4) AS avg_cos
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    GROUP BY 1
    """,
)
def sim_label_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space sanity analytics: average intra-label vs
    inter-label cosine (bounded subset). avg is order-sensitive in the
    last float ulps, so round to 4."""
    emb = (
        load_table(spark, sf_dir, "embeddings", fan_out=True)
        .filter(F.col("vec_id") < 300)
        .select("vec_id", "label", "embedding", norm(F.col("embedding")).alias("nrm"))
    )
    a = emb.select(
        F.col("vec_id").alias("ida"), F.col("label").alias("la"),
        F.col("embedding").alias("va"), F.col("nrm").alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("idb"), F.col("label").alias("lb"),
        F.col("embedding").alias("vb"), F.col("nrm").alias("nb"),
    )
    return (
        a.join(b, F.col("ida") < F.col("idb"))
        .select(
            (F.col("la") == F.col("lb")).alias("same_label"),
            (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("cos_raw"),
        )
        .groupBy("same_label")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg("cos_raw"), 4).alias("avg_cos"),
        )
    )


# ---------------------------------------------------------------------------
# Random-hyperplane LSH ANN (Charikar '02 SimHash for vectors): bucket =
# sign bits of K hyperplane dot products. Planes are deterministic literals
# (fixed LCG), and both engines fold the dot product left-to-right over the
# same operands, so bucket assignment is bit-identical and the WHOLE ANN
# pipeline is oracle-checked — the third ANN strategy next to brute-force
# (exact) and IVF (centroid cells).

LSH_K = 4  # 16 buckets


def _lsh_planes(k: int = LSH_K, dim: int = 64, seed: int = 7) -> list[list[float]]:
    state = seed
    planes = []
    for _ in range(k):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) & (
                (1 << 64) - 1
            )
            row.append(round(((state >> 16) % 2000001) / 1000000.0 - 1.0, 3))
        planes.append(row)
    return planes


def _lsh_bucket_sql(vec: str) -> str:
    """Bucket expr (DuckDB): ordered left-to-right dot-product folds."""
    terms = []
    for j, plane in enumerate(_lsh_planes()):
        lit = "[" + ", ".join(f"{x}" for x in plane) + "]"
        dot_ = (
            f"list_reduce(list_transform(range(1, 65),"
            f" i -> CAST({vec}[i] AS DOUBLE) * ({lit}::DOUBLE[])[i]),"
            f" (a, b) -> a + b)"
        )
        terms.append(f"(CASE WHEN {dot_} > 0 THEN {1 << j} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def _lsh_bucket_col() -> F.Column:
    """Bucket expr (Spark): same ordered fold over the same literals."""
    total = F.lit(0)
    for j, plane in enumerate(_lsh_planes()):
        lit = F.array(*[F.lit(x) for x in plane])
        d = F.aggregate(
            F.zip_with("embedding", lit, lambda v, h: v.cast("double") * h),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        total = total + F.when(d > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return total


@query(
    "sim_topk_lsh",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding, {_lsh_bucket_sql("embedding")} AS bucket
      FROM embeddings),
    q AS (SELECT vec_id AS query_id, embedding AS qv, bucket FROM b
          WHERE vec_id < {N_QUERIES}),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv, bucket FROM b),
    scored AS (
      SELECT query_id, neighbor_id,
             {DUCK_COS.format(a="qv", b="cv")} AS cos_raw
      FROM q JOIN c ON q.bucket = c.bucket AND query_id <> neighbor_id)
    SELECT query_id, neighbor_id, rank, round(cos_raw, 4) AS cos_sim
    FROM (SELECT query_id, neighbor_id, cos_raw,
                 CAST(row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos_raw DESC, neighbor_id) AS INTEGER) AS rank
          FROM scored)
    WHERE rank <= {TOP_K}
    """,
)
def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH approximate top-k: one narrow pass computes
    each vector's K sign bits against broadcast-literal planes (candidates
    only materialize inside a bucket — 1/2^K of the corpus in
    expectation), then exact cosine re-ranks the bucket. Recall vs.
    brute-force is measured in tests/test_similarity.py. At 100 TB the
    bucket id becomes the table's partition/bucketing key, making a probe
    a single-partition read."""
    emb = load_table(spark, sf_dir, "embeddings", fan_out=True).withColumn(
        "bucket", _lsh_bucket_col()
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        norm(F.col("embedding")).alias("qn"),
        "bucket",
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        norm(F.col("embedding")).alias("cn"),
        "bucket",
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos_raw", dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_raw").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id", "neighbor_id", "rank", F.round("cos_raw", 4).alias("cos_sim")
        )
    )


# --------------------------------------------------------------------------
# LSH range search — "all pairs above a similarity threshold", the
# range-query companion to the top-k operators. Same deterministic
# hyperplane buckets as sim_topk_lsh, so the whole pipeline (bucketing +
# exact verification) is oracle-checked end to end.
# --------------------------------------------------------------------------
RANGE_TAU = 0.35


@query(
    "sim_range_search_lsh",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding, {_lsh_bucket_sql("embedding")} AS bucket
      FROM embeddings),
    pairs AS (
      SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
             {DUCK_COS.format(a="a.embedding", b="c.embedding")} AS cos_raw
      FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id)
    SELECT vec_a, vec_b, round(cos_raw, 4) AS cos_sim
    FROM pairs WHERE cos_raw >= {RANGE_TAU}
    """,
)
def sim_range_search_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate range search: every vector pair with cosine ≥ τ, with
    candidate generation restricted to same-LSH-bucket pairs (the exact
    cosine then verifies each candidate — no false positives; recall is
    bounded by the bucket collision probability, measured against the
    brute-force oracle shape in tests).

    Scale: candidates materialize only inside a bucket (1/2^K of the
    corpus each in expectation) — never the all-pairs product. The
    bucket self-join shuffles both sides on the bucket id; a skewed
    bucket (dense region) is where a per-bucket pair cap or a second
    hash table would bound the blowup, exactly like the MinHash-LSH
    MAX_BUCKET cap in dedup.py."""
    emb = load_table(spark, sf_dir, "embeddings", fan_out=True).withColumn(
        "bucket", _lsh_bucket_col()
    )
    a = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("va"),
        norm(F.col("embedding")).alias("na"),
        "bucket",
    )
    c = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("vb"),
        norm(F.col("embedding")).alias("nb"),
        "bucket",
    )
    return (
        a.join(c, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn(
            "cos_raw", dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
        )
        .filter(F.col("cos_raw") >= RANGE_TAU)
        .select("vec_a", "vec_b", F.round("cos_raw", 4).alias("cos_sim"))
    )


# --------------------------------------------------------------------------
# Product quantization (PQ) with asymmetric-distance scoring — the memory-
# compressed ANN scale path (FAISS IndexPQ shape).  Vectors are encoded as
# PQ_M 4-bit codes (argmin L2 to a per-subspace codebook); queries score
# candidates by summing per-subspace lookup-table distances instead of
# touching raw vectors.  At 100 TB the codes table is ~32x smaller than
# the float vectors, the LUTs are broadcast, and the candidate side never
# shuffles.  Codebook is a deterministic strided sample (stand-in for a
# trained k-means codebook; the plumbing — encode, LUT, ADC — is real).
# --------------------------------------------------------------------------
PQ_M = 8          # subspaces (64 dims -> 8 dims each)
PQ_K = 16         # sub-centroids per subspace (4-bit codes)
PQ_SUB = 8        # dims per subspace
PQ_STRIDE = 29    # codebook vectors: vec_id = code_id * 29, code_id < 16


def _sq_l2_terms_sql(a: str, b: str) -> str:
    """Unrolled 8-term squared-L2 between two 1-based DOUBLE[] slices —
    identical left-associated IEEE ops in both engines (t*t, not pow)."""
    return " + ".join(
        f"(({a}[{i}] - {b}[{i}]) * ({a}[{i}] - {b}[{i}]))" for i in range(1, PQ_SUB + 1)
    )


def _sq_l2_col(a: F.Column, b: F.Column) -> F.Column:
    """Spark twin of ``_sq_l2_terms_sql``: same term order, plain
    arithmetic (HOF lambdas are interpreted — unrolled is ~5x faster and
    guarantees the exact same fp association as the SQL)."""
    out = None
    for i in range(PQ_SUB):
        t = (a.getItem(i) - b.getItem(i)) * (a.getItem(i) - b.getItem(i))
        out = t if out is None else out + t
    return out


@query(
    "sim_topk_pq_adc",
    oracle=f"""
    WITH ms AS (SELECT unnest(range({PQ_M})) AS m),
    cb AS (SELECT CAST(vec_id // {PQ_STRIDE} AS INTEGER) AS code_id,
                  CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings
           WHERE vec_id % {PQ_STRIDE} = 0 AND vec_id < {PQ_K * PQ_STRIDE}),
    subc AS (SELECT m, code_id, v[m*{PQ_SUB}+1 : m*{PQ_SUB}+{PQ_SUB}] AS c
             FROM cb CROSS JOIN ms),
    enc AS (SELECT vec_id, m,
                   CAST(embedding AS DOUBLE[])[m*{PQ_SUB}+1 : m*{PQ_SUB}+{PQ_SUB}] AS ev
            FROM embeddings CROSS JOIN ms),
    scored AS (SELECT enc.vec_id, enc.m, subc.code_id,
                      {_sq_l2_terms_sql('ev', 'c')} AS d
               FROM enc JOIN subc ON enc.m = subc.m),
    codes AS (SELECT vec_id, m, code_id FROM (
                SELECT vec_id, m, code_id,
                       row_number() OVER (PARTITION BY vec_id, m
                                          ORDER BY d, code_id) AS rn
                FROM scored) WHERE rn = 1),
    lut AS (SELECT vec_id AS query_id, m, code_id,
                   CAST(d AS DECIMAL(28,16)) AS dd
            FROM scored WHERE vec_id < {N_QUERIES}),
    adc AS (SELECT l.query_id, c.vec_id AS neighbor_id, sum(l.dd) AS s
            FROM codes c JOIN lut l ON c.m = l.m AND c.code_id = l.code_id
            WHERE c.vec_id <> l.query_id
            GROUP BY 1, 2)
    SELECT query_id, neighbor_id, rank, round(CAST(s AS DOUBLE), 4) AS adc_dist
    FROM (SELECT query_id, neighbor_id, s,
                 CAST(row_number() OVER (PARTITION BY query_id
                                         ORDER BY s, neighbor_id) AS INTEGER) AS rank
          FROM adc)
    WHERE rank <= {TOP_K}
    """,
)
def sim_topk_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-encoded approximate top-k by asymmetric distance: encode every
    vector as PQ_M argmin sub-centroid codes, build per-query subspace
    lookup tables, score candidates as the sum of LUT entries over their
    codes.

    Cross-engine exactness: squared-L2 terms are unrolled identically
    (same IEEE association) in Spark and the oracle; the ADC sum
    accumulates in DECIMAL(28,16) because a distributed double sum is
    association-order-dependent (the round-1 DECIMAL rule for any sum
    feeding a rank).

    Scale: the codes table (PQ_M small ints per vector) replaces the
    float vectors in the hot path; LUTs are queries x PQ_M x PQ_K rows —
    broadcast; the ADC aggregation collapses map-side because exploded
    code rows stay clustered by vector.  Argmin encoding is the same
    struct-min hash-agg pattern as sim_topk_ivf (no window sort)."""
    emb = load_table(spark, sf_dir, "embeddings", fan_out=True).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    subs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(m).alias("m"),
                    F.slice("v", m * PQ_SUB + 1, PQ_SUB).alias("ev"),
                )
                for m in range(PQ_M)
            ]
        )
    ).alias("s")
    enc = emb.select("vec_id", subs).select("vec_id", "s.m", "s.ev")
    subc = (
        emb.filter(
            (F.col("vec_id") % PQ_STRIDE == 0) & (F.col("vec_id") < PQ_K * PQ_STRIDE)
        )
        .select(F.expr(f"CAST(vec_id div {PQ_STRIDE} AS INT)").alias("code_id"), "v")
        .select("code_id", subs)
        .select("code_id", "s.m", F.col("s.ev").alias("c"))
    )
    scored = enc.join(F.broadcast(subc), "m").withColumn(
        "d", _sq_l2_col(F.col("ev"), F.col("c"))
    )
    codes = (
        scored.groupBy("vec_id", "m")
        .agg(F.min(F.struct(F.col("d"), F.col("code_id"))).alias("b"))
        .select("vec_id", "m", F.col("b.code_id").alias("code_id"))
    )
    lut = scored.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        "m",
        "code_id",
        F.col("d").cast("decimal(28,16)").alias("dd"),
    )
    adc = (
        codes.join(F.broadcast(lut), ["m", "code_id"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("dd").alias("s"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("s").asc(), F.col("neighbor_id"))
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round(F.col("s").cast("double"), 4).alias("adc_dist"),
        )
    )


@query(
    "sim_topk_ivfpq",
    oracle=f"""
    WITH ms AS (SELECT unnest(range({PQ_M})) AS m),
    cent AS (SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS centv
             FROM embeddings WHERE vec_id % {CENTROID_STRIDE} = 0),
    assign AS (
      SELECT vec_id, centroid_id FROM (
        SELECT e.vec_id, cent.centroid_id,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {DUCK_COS.format(a='e.embedding', b='cent.centv')} DESC,
                          cent.centroid_id) AS rn
        FROM embeddings e CROSS JOIN cent)
      WHERE rn = 1),
    cb AS (SELECT CAST(vec_id // {PQ_STRIDE} AS INTEGER) AS code_id,
                  CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings
           WHERE vec_id % {PQ_STRIDE} = 0 AND vec_id < {PQ_K * PQ_STRIDE}),
    subc AS (SELECT m, code_id, v[m*{PQ_SUB}+1 : m*{PQ_SUB}+{PQ_SUB}] AS c
             FROM cb CROSS JOIN ms),
    enc AS (SELECT vec_id, m,
                   CAST(embedding AS DOUBLE[])[m*{PQ_SUB}+1 : m*{PQ_SUB}+{PQ_SUB}] AS ev
            FROM embeddings CROSS JOIN ms),
    scored AS (SELECT enc.vec_id, enc.m, subc.code_id,
                      {_sq_l2_terms_sql('ev', 'c')} AS d
               FROM enc JOIN subc ON enc.m = subc.m),
    codes AS (SELECT vec_id, m, code_id FROM (
                SELECT vec_id, m, code_id,
                       row_number() OVER (PARTITION BY vec_id, m
                                          ORDER BY d, code_id) AS rn
                FROM scored) WHERE rn = 1),
    lut AS (SELECT s.vec_id AS query_id, a.centroid_id AS qcell, s.m, s.code_id,
                   CAST(s.d AS DECIMAL(28,16)) AS dd
            FROM scored s JOIN assign a ON s.vec_id = a.vec_id
            WHERE s.vec_id < {N_QUERIES}),
    adc AS (SELECT l.query_id, c.vec_id AS neighbor_id, sum(l.dd) AS s
            FROM codes c
            JOIN assign ca ON c.vec_id = ca.vec_id
            JOIN lut l ON c.m = l.m AND c.code_id = l.code_id
                      AND ca.centroid_id = l.qcell
            WHERE c.vec_id <> l.query_id
            GROUP BY 1, 2)
    SELECT query_id, neighbor_id, rank, round(CAST(s AS DOUBLE), 4) AS adc_dist
    FROM (SELECT query_id, neighbor_id, s,
                 CAST(row_number() OVER (PARTITION BY query_id
                                         ORDER BY s, neighbor_id) AS INTEGER) AS rank
          FROM adc)
    WHERE rank <= {TOP_K}
    """,
)
def sim_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ: the billion-scale ANN index shape (FAISS IndexIVFPQ with
    by_residual=false) — coarse IVF cells prune the candidate set, PQ
    codes + per-query LUTs score the survivors by asymmetric distance,
    so a probe touches 1/n_cells of the corpus and never reads a raw
    vector.

    Composition of the two proven parts: the coarse assignment is
    sim_topk_ivf's struct-max hash-agg; encoding/LUT/ADC are
    sim_topk_pq_adc's (same DECIMAL accumulation for engine-exact
    ranks).  At 100 TB the codes+cell table is the only thing scanned at
    query time (~32x smaller than the vectors), cells prune a further
    ~n_cells x, and the per-query LUTs broadcast."""
    emb = load_table(spark, sf_dir, "embeddings", fan_out=True).select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        norm(F.col("embedding")).alias("nrm"),
    )
    cent = emb.select(
        F.col("vec_id").alias("centroid_id"),
        F.col("v").alias("centv"),
        F.col("nrm").alias("centn"),
    ).filter(F.col("centroid_id") % CENTROID_STRIDE == 0)
    assign = (
        emb.crossJoin(F.broadcast(cent))
        .withColumn(
            "cent_cos",
            dot(F.col("v"), F.col("centv")) / (F.col("nrm") * F.col("centn")),
        )
        .groupBy("vec_id")
        .agg(
            F.max(
                F.struct(
                    F.col("cent_cos").alias("cent_cos"),
                    (-F.col("centroid_id")).alias("neg_cid"),
                    F.col("centroid_id").alias("centroid_id"),
                )
            ).alias("b")
        )
        .select("vec_id", F.col("b.centroid_id").alias("cell"))
    )
    subs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(m).alias("m"),
                    F.slice("v", m * PQ_SUB + 1, PQ_SUB).alias("ev"),
                )
                for m in range(PQ_M)
            ]
        )
    ).alias("s")
    enc = emb.select("vec_id", subs).select("vec_id", "s.m", "s.ev")
    subc = (
        emb.filter(
            (F.col("vec_id") % PQ_STRIDE == 0) & (F.col("vec_id") < PQ_K * PQ_STRIDE)
        )
        .select(F.expr(f"CAST(vec_id div {PQ_STRIDE} AS INT)").alias("code_id"), "v")
        .select("code_id", subs)
        .select("code_id", "s.m", F.col("s.ev").alias("c"))
    )
    scored = enc.join(F.broadcast(subc), "m").withColumn(
        "d", _sq_l2_col(F.col("ev"), F.col("c"))
    )
    codes = (
        scored.groupBy("vec_id", "m")
        .agg(F.min(F.struct(F.col("d"), F.col("code_id"))).alias("b"))
        .select("vec_id", "m", F.col("b.code_id").alias("code_id"))
        .join(assign, "vec_id")
    )
    lut = (
        scored.filter(F.col("vec_id") < N_QUERIES)
        .join(assign, "vec_id")
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("cell").alias("qcell"),
            "m",
            "code_id",
            F.col("d").cast("decimal(28,16)").alias("dd"),
        )
    )
    adc = (
        codes.join(
            F.broadcast(lut),
            (codes.m == lut.m)
            & (codes.code_id == lut.code_id)
            & (codes.cell == lut.qcell),
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("dd").alias("s"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("s").asc(), F.col("neighbor_id"))
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round(F.col("s").cast("double"), 4).alias("adc_dist"),
        )
    )


# --------------------------------------------------------------------------
# Hybrid search: reciprocal-rank fusion of two retrieval systems, and the
# recall-evaluation harness that grades the approximate indexes against
# the exact ranking — the two standard IR compositions on top of top-k.
# --------------------------------------------------------------------------
_RRF_K = 60  # the standard RRF damping constant (Cormack et al.)

# Compact oracle CTEs re-stating the exact and LSH top-k rankings (the
# same SQL the individual queries carry, inlined so each oracle stays
# self-contained for DuckDB).
_BF_TOPK_CTE = f"""
    bf AS (
      SELECT query_id, neighbor_id, rank FROM (
        SELECT q.query_id, c.neighbor_id,
               CAST(row_number() OVER (PARTITION BY q.query_id
                 ORDER BY {DUCK_COS.format(a='q.qv', b='c.cv')} DESC,
                          c.neighbor_id) AS INTEGER) AS rank
        FROM (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
              WHERE vec_id < {N_QUERIES}) q
        JOIN (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings) c
          ON query_id <> neighbor_id)
      WHERE rank <= {TOP_K})
"""


def _lsh_topk_cte() -> str:
    return f"""
    lb AS (
      SELECT vec_id, embedding, {_lsh_bucket_sql("embedding")} AS bucket
      FROM embeddings),
    lsh AS (
      SELECT query_id, neighbor_id, rank FROM (
        SELECT q.query_id, c.neighbor_id,
               CAST(row_number() OVER (PARTITION BY q.query_id
                 ORDER BY {DUCK_COS.format(a='q.qv', b='c.cv')} DESC,
                          c.neighbor_id) AS INTEGER) AS rank
        FROM (SELECT vec_id AS query_id, embedding AS qv, bucket FROM lb
              WHERE vec_id < {N_QUERIES}) q
        JOIN (SELECT vec_id AS neighbor_id, embedding AS cv, bucket FROM lb) c
          ON q.bucket = c.bucket AND query_id <> neighbor_id)
      WHERE rank <= {TOP_K})
"""


@query(
    "sim_hybrid_rrf",
    oracle=f"""
    WITH {_BF_TOPK_CTE.strip()},
    {_lsh_topk_cte().strip()},
    fused AS (
      SELECT coalesce(bf.query_id, lsh.query_id) AS query_id,
             coalesce(bf.neighbor_id, lsh.neighbor_id) AS neighbor_id,
             coalesce(1.0 / ({_RRF_K} + bf.rank), 0)
             + coalesce(1.0 / ({_RRF_K} + lsh.rank), 0) AS rrf
      FROM bf FULL OUTER JOIN lsh
        ON bf.query_id = lsh.query_id AND bf.neighbor_id = lsh.neighbor_id)
    SELECT query_id, neighbor_id, fused_rank, round(rrf, 6) AS rrf_score
    FROM (SELECT query_id, neighbor_id, rrf,
                 CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY rrf DESC, neighbor_id) AS INTEGER) AS fused_rank
          FROM fused)
    WHERE fused_rank <= {TOP_K}
    """,
)
def sim_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of the exact cosine ranking and the LSH
    ranking: score = sum over systems of 1/(60 + rank) — the standard
    hybrid-search combiner (it needs only RANKS, so heterogeneous
    scorers fuse without calibration).  Composes the two registered
    top-k queries as DataFrames; ranks are exact integers so the fused
    score is engine-exact double arithmetic.

    Scale: each input is already a per-query top-k (K rows per query);
    the fusion join and re-rank touch K x queries rows — negligible next
    to retrieval.  This is the composition shape for fusing BM25 + dense
    retrieval at corpus scale: rankers run as independent narrow
    pipelines, fusion is a tiny outer join keyed on (query, doc)."""
    bf = sim_topk_bruteforce(spark, sf_dir).select(
        "query_id", "neighbor_id", F.col("rank").alias("bf_rank")
    )
    lsh = sim_topk_lsh(spark, sf_dir).select(
        "query_id", "neighbor_id", F.col("rank").alias("lsh_rank")
    )
    fused = bf.join(lsh, ["query_id", "neighbor_id"], "full_outer").select(
        "query_id",
        "neighbor_id",
        (
            F.coalesce(1.0 / (_RRF_K + F.col("bf_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (_RRF_K + F.col("lsh_rank")), F.lit(0.0))
        ).alias("rrf"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("rrf").desc(), "neighbor_id")
    return (
        fused.withColumn("fused_rank", F.row_number().over(w))
        .filter(F.col("fused_rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "fused_rank",
            F.round("rrf", 6).alias("rrf_score"),
        )
    )


@query(
    "sim_ann_recall_eval",
    oracle=f"""
    WITH {_BF_TOPK_CTE.strip()},
    {_lsh_topk_cte().strip()},
    cent AS (SELECT vec_id AS centroid_id, embedding AS centv FROM embeddings
             WHERE vec_id % {CENTROID_STRIDE} = 0),
    assign AS (
      SELECT vec_id, centroid_id FROM (
        SELECT e.vec_id, cent.centroid_id,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {DUCK_COS.format(a='e.embedding', b='cent.centv')} DESC,
                          cent.centroid_id) AS rn
        FROM embeddings e CROSS JOIN cent)
      WHERE rn = 1),
    ivf AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, c.neighbor_id,
               CAST(row_number() OVER (PARTITION BY q.query_id
                 ORDER BY {DUCK_COS.format(a='q.qv', b='c.cv')} DESC,
                          c.neighbor_id) AS INTEGER) AS rank
        FROM (SELECT e.vec_id AS query_id, e.embedding AS qv, a.centroid_id
              FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id
              WHERE e.vec_id < {N_QUERIES}) q
        JOIN (SELECT e.vec_id AS neighbor_id, e.embedding AS cv, a.centroid_id
              FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id) c
          ON q.centroid_id = c.centroid_id AND query_id <> neighbor_id)
      WHERE rank <= {TOP_K})
    SELECT bf.query_id,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(count(ivf.neighbor_id) AS BIGINT) AS n_hit_ivf,
           CAST(count(lsh.neighbor_id) AS BIGINT) AS n_hit_lsh,
           round(count(ivf.neighbor_id) * 1.0 / count(*), 4) AS recall_ivf,
           round(count(lsh.neighbor_id) * 1.0 / count(*), 4) AS recall_lsh
    FROM bf
    LEFT JOIN ivf ON bf.query_id = ivf.query_id
                 AND bf.neighbor_id = ivf.neighbor_id
    LEFT JOIN lsh ON bf.query_id = lsh.query_id
                 AND bf.neighbor_id = lsh.neighbor_id
    GROUP BY bf.query_id
    """,
)
def sim_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k evaluation harness IN the engine: per query, how many of
    the exact top-k neighbors each approximate index (IVF, LSH)
    recovered.  The index-quality report a vector store publishes,
    computed as a query instead of a notebook.

    Scale: ground truth on a sampled query set (here vec_id < N_QUERIES;
    at 100 TB a ~1e3 query sample) — the exact ranking is only ever
    computed for the sample, the approximate sides reuse the production
    index pipelines; the membership joins touch K x queries rows.  The
    approximate legs are <= N_QUERIES*TOP_K rows BY CONSTRUCTION (top-k
    per sampled query), so they carry explicit broadcast hints: the
    planner only sees post-window size estimates too wide to pick
    BroadcastHashJoin on its own, and without the hints both membership
    joins sort-merge (r14: 2 SortMergeJoin -> 0, 22 -> 20 exchanges)."""
    bf = sim_topk_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    ivf = sim_topk_ivf(spark, sf_dir).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit_ivf")
    )
    lsh = sim_topk_lsh(spark, sf_dir).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit_lsh")
    )
    joined = bf.join(F.broadcast(ivf), ["query_id", "neighbor_id"], "left").join(
        F.broadcast(lsh), ["query_id", "neighbor_id"], "left"
    )
    return joined.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.count("hit_ivf").alias("n_hit_ivf"),
        F.count("hit_lsh").alias("n_hit_lsh"),
        F.round(F.count("hit_ivf") * 1.0 / F.count(F.lit(1)), 4).alias("recall_ivf"),
        F.round(F.count("hit_lsh") * 1.0 / F.count(F.lit(1)), 4).alias("recall_lsh"),
    )


# --------------------------------------------------------------------------
# Graded ranking eval: rational-discount nDCG + MRR of the IVF index
# against the exact ranking — the graded companion to sim_ann_recall_eval
# (recall treats all top-k hits equally; nDCG rewards putting the BEST
# neighbors first).
# --------------------------------------------------------------------------
_NDCG_LCM = 60  # lcm(2..6): makes every discount 60/(rank+1) an integer


def _ivf_topk_cte() -> str:
    """IVF ranking CTE (same derivation as sim_topk_ivf / recall eval),
    exposing the approximate rank."""
    return f"""
    cent AS (SELECT vec_id AS centroid_id, embedding AS centv FROM embeddings
             WHERE vec_id % {CENTROID_STRIDE} = 0),
    assign AS (
      SELECT vec_id, centroid_id FROM (
        SELECT e.vec_id, cent.centroid_id,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {DUCK_COS.format(a='e.embedding', b='cent.centv')} DESC,
                          cent.centroid_id) AS rn
        FROM embeddings e CROSS JOIN cent)
      WHERE rn = 1),
    ivf AS (
      SELECT query_id, neighbor_id, rank FROM (
        SELECT q.query_id, c.neighbor_id,
               CAST(row_number() OVER (PARTITION BY q.query_id
                 ORDER BY {DUCK_COS.format(a='q.qv', b='c.cv')} DESC,
                          c.neighbor_id) AS INTEGER) AS rank
        FROM (SELECT e.vec_id AS query_id, e.embedding AS qv, a.centroid_id
              FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id
              WHERE e.vec_id < {N_QUERIES}) q
        JOIN (SELECT e.vec_id AS neighbor_id, e.embedding AS cv, a.centroid_id
              FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id) c
          ON q.centroid_id = c.centroid_id AND query_id <> neighbor_id)
      WHERE rank <= {TOP_K})"""


@query(
    "sim_ann_ndcg_eval",
    oracle=f"""
    WITH {_BF_TOPK_CTE.strip()},
    {_ivf_topk_cte().strip()},
    graded AS (
      SELECT bf.query_id,
             CAST({TOP_K} + 1 - bf.rank AS BIGINT) AS gain,
             ivf.rank AS arank
      FROM bf LEFT JOIN ivf ON bf.query_id = ivf.query_id
                           AND bf.neighbor_id = ivf.neighbor_id),
    agg AS (
      SELECT query_id,
             CAST(sum(CASE WHEN arank IS NULL THEN 0
                           ELSE gain * ({_NDCG_LCM} / (arank + 1)) END)
                  AS BIGINT) AS dcg60,
             CAST(sum(gain * ({_NDCG_LCM}
                      / (({TOP_K} + 1 - gain) + 1))) AS BIGINT) AS idcg60,
             CAST(count(arank) AS BIGINT) AS n_hit,
             min(arank) AS best_rank
      FROM graded GROUP BY query_id)
    SELECT query_id, n_hit, dcg60, idcg60,
           round(dcg60 * 1.0 / idcg60, 6) AS ndcg,
           round(CASE WHEN best_rank IS NULL THEN 0.0
                      ELSE ({_NDCG_LCM} / best_rank) / {_NDCG_LCM}.0 END, 6)
             AS mrr
    FROM agg
    """,
)
def sim_ann_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rational-discount nDCG@k + MRR of the IVF index against the exact
    top-k: gain = k+1-exact_rank (linear), discount = 1/(approx_rank+1)
    — scaled by lcm(2..6)=60 so DCG and ideal-DCG are EXACT INTEGERS
    (the classic log2 discount would sum libm doubles whose association
    order differs across engines; the rational discount keeps the same
    monotone rank-weighting with integer-exact cross-engine math).  MRR
    uses 1/best_approx_rank, also exact (60/rank divides evenly).

    Scale: same as the recall eval — exact ground truth only for the
    query SAMPLE; the IVF side reuses the production index plan; the
    grading join touches k x queries rows."""
    bf = sim_topk_bruteforce(spark, sf_dir).select(
        "query_id", "neighbor_id", F.col("rank").alias("erank")
    )
    ivf = sim_topk_ivf(spark, sf_dir).select(
        "query_id", "neighbor_id", F.col("rank").alias("arank")
    )
    graded = bf.join(ivf, ["query_id", "neighbor_id"], "left").select(
        "query_id",
        (F.lit(TOP_K + 1) - F.col("erank")).cast("long").alias("gain"),
        "arank",
    )
    dcg60 = F.sum(
        F.when(F.col("arank").isNull(), F.lit(0)).otherwise(
            F.col("gain") * (_NDCG_LCM / (F.col("arank") + 1)).cast("long")
        )
    )
    idcg60 = F.sum(
        F.col("gain")
        * (_NDCG_LCM / ((F.lit(TOP_K + 1) - F.col("gain")) + 1)).cast("long")
    )
    agg = graded.groupBy("query_id").agg(
        dcg60.cast("long").alias("dcg60"),
        idcg60.cast("long").alias("idcg60"),
        F.count("arank").alias("n_hit"),
        F.min("arank").alias("best_rank"),
    )
    return agg.select(
        "query_id",
        "n_hit",
        "dcg60",
        "idcg60",
        F.round(F.col("dcg60") * 1.0 / F.col("idcg60"), 6).alias("ndcg"),
        F.round(
            F.when(F.col("best_rank").isNull(), F.lit(0.0)).otherwise(
                (_NDCG_LCM / F.col("best_rank")).cast("long") / float(_NDCG_LCM)
            ),
            6,
        ).alias("mrr"),
    )


# --------------------------------------------------------------------------
# Incremental IVF maintenance: assign a NEW vector batch against the
# frozen codebook and report per-cell growth — O(batch), not O(index).
# The index-maintenance twin of dedup_incremental_batch.
# --------------------------------------------------------------------------
_IVF_BATCH_FROM = 400  # vec_id >= 400 arrive as the new batch
_IVF_GROW_MULT = 2.0  # growth alarm: cell would exceed 2x the mean size


def _ivf_assign_cte(src: str, name: str) -> str:
    return f"""
    {name} AS (
      SELECT vec_id, centroid_id FROM (
        SELECT e.vec_id, cent.centroid_id,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {DUCK_COS.format(a='e.embedding', b='cent.centv')} DESC,
                          cent.centroid_id) AS rn
        FROM ({src}) e CROSS JOIN cent)
      WHERE rn = 1)"""


@query(
    "sim_ivf_incremental_update",
    oracle=f"""
    WITH cent AS (SELECT vec_id AS centroid_id, embedding AS centv
                  FROM embeddings WHERE vec_id % {CENTROID_STRIDE} = 0),
    {_ivf_assign_cte(f"SELECT * FROM embeddings WHERE vec_id < {_IVF_BATCH_FROM}", "old_asg").strip()},
    {_ivf_assign_cte(f"SELECT * FROM embeddings WHERE vec_id >= {_IVF_BATCH_FROM}", "new_asg").strip()},
    oldc AS (SELECT centroid_id, CAST(count(*) AS BIGINT) AS n_old
             FROM old_asg GROUP BY 1),
    newc AS (SELECT centroid_id, CAST(count(*) AS BIGINT) AS n_new,
                    CAST(min(vec_id) AS BIGINT) AS first_new_id
             FROM new_asg GROUP BY 1),
    cells AS (
      SELECT c.centroid_id,
             coalesce(o.n_old, 0) AS n_old,
             coalesce(n.n_new, 0) AS n_new,
             n.first_new_id
      FROM cent c
      LEFT JOIN oldc o ON o.centroid_id = c.centroid_id
      LEFT JOIN newc n ON n.centroid_id = c.centroid_id),
    tot AS (SELECT CAST(sum(n_old + n_new) AS BIGINT) AS n_total,
                   CAST(count(*) AS BIGINT) AS n_cells FROM cells)
    SELECT centroid_id, n_old, n_new,
           CAST(n_old + n_new AS BIGINT) AS n_after,
           first_new_id,
           (n_old + n_new) * tot.n_cells > {_IVF_GROW_MULT} * tot.n_total
             AS needs_split
    FROM cells, tot
    """,
)
def sim_ivf_incremental_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF index maintenance: a new vector batch (vec_id >=
    {b}) is assigned against the FROZEN coarse codebook and folded into
    per-cell counts; cells whose post-ingest size exceeds {m}x the mean
    get a `needs_split` alarm (the trigger for local re-clustering).

    Scale contract: the new work is O(batch) — one broadcast-codebook
    argmax over batch rows plus a |cells|-sized count merge; the
    existing index is NOT rescanned (here the old counts are recomputed
    because the test harness stores no state; in production they are
    the index's cell directory, read not rebuilt — same as the
    incremental dedup op's corpus-side posting list).  Assignment is
    the struct-max hash-agg (no window over data); the growth alarm is
    an exact integer cross-multiplication (no division drift).
    """.format(b=_IVF_BATCH_FROM, m=_IVF_GROW_MULT)
    emb = load_table(spark, sf_dir, "embeddings", fan_out=True).withColumn(
        "nrm", norm(F.col("embedding"))
    )
    cent = emb.filter(F.col("vec_id") % CENTROID_STRIDE == 0).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centv"),
        F.col("nrm").alias("centn"),
    )

    def assign(df):
        return (
            df.crossJoin(F.broadcast(cent))
            .withColumn(
                "cent_cos",
                dot(F.col("embedding"), F.col("centv"))
                / (F.col("nrm") * F.col("centn")),
            )
            .groupBy("vec_id")
            .agg(
                F.max(
                    F.struct(
                        F.col("cent_cos").alias("cent_cos"),
                        (-F.col("centroid_id")).alias("neg_cid"),
                        F.col("centroid_id").alias("centroid_id"),
                    )
                ).alias("b")
            )
            .select("vec_id", F.col("b.centroid_id").alias("centroid_id"))
        )

    old_counts = (
        assign(emb.filter(F.col("vec_id") < _IVF_BATCH_FROM))
        .groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("n_old"))
    )
    new_counts = (
        assign(emb.filter(F.col("vec_id") >= _IVF_BATCH_FROM))
        .groupBy("centroid_id")
        .agg(
            F.count(F.lit(1)).alias("n_new"),
            F.min("vec_id").alias("first_new_id"),
        )
    )
    cells = (
        cent.select("centroid_id")
        .join(old_counts, "centroid_id", "left")
        .join(new_counts, "centroid_id", "left")
        .select(
            "centroid_id",
            F.coalesce("n_old", F.lit(0)).alias("n_old"),
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
            "first_new_id",
        )
    )
    tot = cells.agg(
        F.sum(F.col("n_old") + F.col("n_new")).alias("n_total"),
        F.count(F.lit(1)).alias("n_cells"),
    )
    return cells.crossJoin(F.broadcast(tot)).select(
        "centroid_id",
        "n_old",
        "n_new",
        (F.col("n_old") + F.col("n_new")).alias("n_after"),
        "first_new_id",
        (
            (F.col("n_old") + F.col("n_new")) * F.col("n_cells")
            > _IVF_GROW_MULT * F.col("n_total")
        ).alias("needs_split"),
    )


# --------------------------------------------------------------------------
# Matryoshka prefix-dimension retrieval eval (Kusupati et al. 2022,
# arXiv:2205.13147, public): score ANN quality using only the first k
# dimensions of each embedding — the storage/latency knob modern
# embedding models expose.  Recall@k per prefix length vs the full-dim
# exact ranking.
# --------------------------------------------------------------------------
_MAT_PREFIXES = [8, 16, 32]


def _mat_topk_cte(k: int) -> str:
    sliced = f"CAST(embedding[1:{k}] AS DOUBLE[])"
    return f"""
    p{k} AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, c.neighbor_id,
               CAST(row_number() OVER (PARTITION BY q.query_id
                 ORDER BY list_cosine_similarity(q.qv, c.cv) DESC,
                          c.neighbor_id) AS INTEGER) AS rank
        FROM (SELECT vec_id AS query_id, {sliced} AS qv FROM embeddings
              WHERE vec_id < {N_QUERIES}) q
        JOIN (SELECT vec_id AS neighbor_id, {sliced} AS cv
              FROM embeddings) c
          ON query_id <> neighbor_id)
      WHERE rank <= {TOP_K})"""


@query(
    "sim_matryoshka_prefix_recall",
    oracle=f"""
    WITH {_BF_TOPK_CTE.strip()},
    {",".join(_mat_topk_cte(k).strip() for k in _MAT_PREFIXES)}
    SELECT k, CAST(count(*) AS BIGINT) AS n_exact,
           CAST(count(hit) AS BIGINT) AS n_hit,
           round(count(hit) * 1.0 / count(*), 4) AS recall
    FROM (
      {" UNION ALL ".join(
        f'''SELECT {k} AS k, bf.query_id, bf.neighbor_id, p.neighbor_id AS hit
        FROM bf LEFT JOIN p{k} p ON p.query_id = bf.query_id
                                AND p.neighbor_id = bf.neighbor_id'''
        for k in _MAT_PREFIXES)})
    GROUP BY k
    """,
)
def sim_matryoshka_prefix_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style prefix-dimension eval: re-rank with only the
    first k of 64 dims (k in {ks}) and measure recall@{t} against the
    full-dimension exact top-{t}.  The dimension-budget/recall curve
    tells a vector store how far it can truncate stored embeddings —
    an 8x storage cut is free if recall holds.

    Scale: each prefix ranking reuses the brute-force plan with SLICED
    arrays (the slice happens in the scan projection — shorter folds,
    proportionally cheaper dot products); the grading joins touch
    k x queries rows.  At 100 TB the prefix rankings would run against
    a truncated copy of the index — same plan, smaller table.
    """.format(ks=_MAT_PREFIXES, t=TOP_K)
    bf = sim_topk_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    outs = []
    for k in _MAT_PREFIXES:
        emb = load_table(spark, sf_dir, "embeddings", fan_out=True).select(
            "vec_id", F.slice("embedding", 1, k).alias("pv")
        ).withColumn("pn", norm(F.col("pv")))
        q = emb.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("pv").alias("qv"),
            F.col("pn").alias("qn"),
        )
        c = emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("pv").alias("cv"),
            F.col("pn").alias("cn"),
        )
        scored = (
            c.crossJoin(F.broadcast(q))
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .withColumn(
                "cos_p",
                dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")),
            )
        )
        w = W.partitionBy("query_id").orderBy(
            F.col("cos_p").desc(), F.col("neighbor_id")
        )
        pk = (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= TOP_K)
            .select("query_id", "neighbor_id", F.lit(1).alias("hit"))
        )
        outs.append(
            bf.join(pk, ["query_id", "neighbor_id"], "left").select(
                F.lit(k).alias("k"), "hit"
            )
        )
    allk = outs[0]
    for df in outs[1:]:
        allk = allk.unionAll(df)
    return allk.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.count("hit").alias("n_hit"),
        F.round(F.count("hit") * 1.0 / F.count(F.lit(1)), 4).alias("recall"),
    )


# --------------------------------------------------------------------------
# IVF probe sweep: the cost/recall CURVE that tunes nprobe — recall@k and
# candidate volume at nprobe in {1, 2, 4}, in ONE query.  Companion to
# sim_ann_recall_eval (which fixes nprobe=1) and the LSH pr_eval: the
# "measure, don't guess" loop for the IVF index's one tuning knob.
# --------------------------------------------------------------------------
_PROBE_LEVELS = [1, 2, 4]


def _probe_sweep_oracle() -> str:
    return f"""
    WITH cent AS (SELECT vec_id AS centroid_id, embedding AS centv FROM embeddings
                  WHERE vec_id % {CENTROID_STRIDE} = 0),
    assign AS (
      SELECT vec_id, centroid_id FROM (
        SELECT e.vec_id, cent.centroid_id,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {DUCK_COS.format(a='e.embedding', b='cent.centv')} DESC,
                          cent.centroid_id) AS rn
        FROM embeddings e CROSS JOIN cent)
      WHERE rn = 1),
    probes AS (
      SELECT query_id, centroid_id, probe_rank FROM (
        SELECT e.vec_id AS query_id, cent.centroid_id,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {DUCK_COS.format(a='e.embedding', b='cent.centv')} DESC,
                          cent.centroid_id) AS probe_rank
        FROM embeddings e CROSS JOIN cent
        WHERE e.vec_id < {N_QUERIES})
      WHERE probe_rank <= {max(_PROBE_LEVELS)}),
    levels AS (SELECT unnest([{", ".join(str(p) for p in _PROBE_LEVELS)}]) AS np),
    scored AS (
      SELECT l.np, p.query_id, c.vec_id AS neighbor_id,
             {DUCK_COS.format(a='q.embedding', b='c.embedding')} AS cos_raw
      FROM levels l
      JOIN probes p ON p.probe_rank <= l.np
      JOIN assign a ON a.centroid_id = p.centroid_id
      JOIN embeddings c ON c.vec_id = a.vec_id AND c.vec_id <> p.query_id
      JOIN embeddings q ON q.vec_id = p.query_id),
    ranked AS (
      SELECT np, query_id, neighbor_id,
             row_number() OVER (PARTITION BY np, query_id
               ORDER BY cos_raw DESC, neighbor_id) AS rank
      FROM scored),
    bf AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY {DUCK_COS.format(a='q.embedding', b='c.embedding')} DESC,
                          c.vec_id) AS rank
        FROM (SELECT * FROM embeddings WHERE vec_id < {N_QUERIES}) q
        JOIN embeddings c ON c.vec_id <> q.vec_id)
      WHERE rank <= {TOP_K}),
    hits AS (
      SELECT r.np, CAST(count(*) AS BIGINT) AS n_hits
      FROM ranked r JOIN bf ON bf.query_id = r.query_id
                           AND bf.neighbor_id = r.neighbor_id
      WHERE r.rank <= {TOP_K}
      GROUP BY r.np),
    cost AS (
      SELECT np, CAST(count(*) AS BIGINT) AS total_candidates
      FROM scored GROUP BY np)
    SELECT c.np, CAST({N_QUERIES} AS BIGINT) AS n_queries,
           c.total_candidates, coalesce(h.n_hits, 0) AS n_hits,
           round(coalesce(h.n_hits, 0) * 1.0
                 / ({N_QUERIES} * {TOP_K}), 4) AS mean_recall
    FROM cost c LEFT JOIN hits h ON h.np = c.np
    """


@query("sim_ivf_probe_sweep", oracle=_probe_sweep_oracle())
def sim_ivf_probe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k vs candidate volume at nprobe in {np} — the IVF tuning
    curve as one query: probe assignment ranks each query's centroids
    once, every probe level reuses the same scored candidates, and the
    report pairs mean recall against total candidates (the cost axis a
    1000-executor deployment actually budgets).

    Scale: centroids broadcast; the only per-level work is the bounded
    window over each query's candidate cells (cells x cell-size rows per
    query, never the corpus); the brute-force ground truth runs only on
    the {q}-query sample, as in sim_ann_recall_eval.
    """.format(np=_PROBE_LEVELS, q=N_QUERIES)
    emb = load_table(spark, sf_dir, "embeddings", fan_out=True).withColumn(
        "nrm", norm(F.col("embedding"))
    )
    cent = emb.filter(F.col("vec_id") % CENTROID_STRIDE == 0).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centv"),
        F.col("nrm").alias("centn"),
    )
    # corpus assignment: hash-agg argmax (one row per vector pre-exchange)
    assign = (
        emb.crossJoin(F.broadcast(cent))
        .withColumn(
            "cent_cos",
            dot(F.col("embedding"), F.col("centv")) / (F.col("nrm") * F.col("centn")),
        )
        .groupBy("vec_id")
        .agg(
            F.max(
                F.struct(
                    F.col("cent_cos").alias("cent_cos"),
                    (-F.col("centroid_id")).alias("neg_cid"),
                    F.col("centroid_id").alias("centroid_id"),
                    F.col("embedding").alias("embedding"),
                    F.col("nrm").alias("nrm"),
                )
            ).alias("b")
        )
        .select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("b.embedding").alias("cv"),
            F.col("b.nrm").alias("cn"),
            F.col("b.centroid_id").alias("centroid_id"),
        )
    )
    # query probe ranking: top-max(np) centroids per query (tiny window)
    wq = W.partitionBy("query_id").orderBy(
        F.col("probe_cos").desc(), F.col("centroid_id")
    )
    probes = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qv"),
            F.col("nrm").alias("qn"),
        )
        .crossJoin(F.broadcast(cent))
        .withColumn(
            "probe_cos",
            dot(F.col("qv"), F.col("centv")) / (F.col("qn") * F.col("centn")),
        )
        .withColumn("probe_rank", F.row_number().over(wq))
        .filter(F.col("probe_rank") <= max(_PROBE_LEVELS))
        .select("query_id", "qv", "qn", "centroid_id", "probe_rank")
    )
    levels = spark.createDataFrame([(p,) for p in _PROBE_LEVELS], "np int")
    scored = (
        assign.join(
            F.broadcast(
                probes.join(F.broadcast(levels), F.col("probe_rank") <= F.col("np"))
            ),
            "centroid_id",
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos_raw", dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
        )
        .select("np", "query_id", "neighbor_id", "cos_raw")
    )
    wr = W.partitionBy("np", "query_id").orderBy(
        F.col("cos_raw").desc(), F.col("neighbor_id")
    )
    ranked = scored.withColumn("rank", F.row_number().over(wr))
    bf = sim_topk_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    hits = (
        ranked.filter(F.col("rank") <= TOP_K)
        .join(bf, ["query_id", "neighbor_id"])
        .groupBy("np")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    cost = scored.groupBy("np").agg(F.count(F.lit(1)).alias("total_candidates"))
    return cost.join(hits, "np", "left").select(
        "np",
        F.lit(N_QUERIES).cast("long").alias("n_queries"),
        "total_candidates",
        F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
        F.round(
            F.coalesce("n_hits", F.lit(0)) * 1.0 / (N_QUERIES * TOP_K), 4
        ).alias("mean_recall"),
    )


# --------------------------------------------------------------------------
# Paired sign test: is IVF's per-query recall advantage over LSH
# statistically meaningful, or noise?  The exact two-sided binomial sign
# test over the query sample — closing the eval loop sim_ann_recall_eval
# opens (that op reports the recalls; this one reports whether the
# difference survives n=10 queries).  Everything is exact integer
# arithmetic: binomial coefficients via the integer-divisible recurrence,
# the p-value an exact rational, and the 0.05 verdict an integer
# comparison (20 * p_num < 2^n) — no float boundary anywhere.
# --------------------------------------------------------------------------


def _sign_test_oracle() -> str:
    from ..registry import ORACLES

    recall = ORACLES["sim_ann_recall_eval"].strip()
    return f"""
    WITH wl AS (
      SELECT CAST(sum(CASE WHEN n_hit_ivf > n_hit_lsh THEN 1 ELSE 0 END)
                  AS BIGINT) AS w,
             CAST(sum(CASE WHEN n_hit_lsh > n_hit_ivf THEN 1 ELSE 0 END)
                  AS BIGINT) AS l,
             CAST(sum(CASE WHEN n_hit_ivf = n_hit_lsh THEN 1 ELSE 0 END)
                  AS BIGINT) AS t
      FROM ({recall}) r),
    p AS (
      SELECT w, l, t, w + l AS n,
             2 * list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                     list_transform(range(0, least(w, l) + 1), i ->
                       list_reduce(
                         list_prepend(CAST(1 AS BIGINT),
                           list_transform(range(1, i + 1),
                                          j -> CAST(j AS BIGINT))),
                         (c, j) -> (c * ((w + l) - j + 1)) // j))),
                   (acc, x) -> acc + x) AS p_num
      FROM wl)
    SELECT n AS n_informative, w AS ivf_wins, l AS lsh_wins, t AS ties,
           round(least(p_num * 1.0 / power(2, n), 1.0), 6) AS p_value,
           CASE WHEN n = 0 THEN FALSE
                ELSE 20 * p_num < CAST(power(2, n) AS BIGINT) END
             AS significant_05
    FROM p
    """


@query("eval_ann_sign_test", oracle=_sign_test_oracle())
def eval_ann_sign_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided exact binomial sign test on per-query recall: wins =
    queries where IVF recovered strictly more exact neighbors than LSH,
    losses the reverse, ties dropped; p = 2 * sum_(i<=min(w,l)) C(n,i)
    / 2^n (capped at 1).  Coefficients come from the sequential integer
    recurrence c <- c*(n-j+1)/j (each division exact — the prefix
    product is always divisible), the p-value is an exact rational, and
    the alpha=0.05 verdict is the integer comparison 20*p_num < 2^n.

    Scale: the per-query recall legs reuse the production index
    pipelines over the query SAMPLE (sim_ann_recall_eval's design); the
    sign test itself folds over <= n+1 integers in one row."""
    recall = sim_ann_recall_eval(spark, sf_dir)
    wl = recall.agg(
        F.sum(F.when(F.col("n_hit_ivf") > F.col("n_hit_lsh"), 1).otherwise(0))
        .cast("long")
        .alias("w"),
        F.sum(F.when(F.col("n_hit_lsh") > F.col("n_hit_ivf"), 1).otherwise(0))
        .cast("long")
        .alias("l"),
        F.sum(F.when(F.col("n_hit_ivf") == F.col("n_hit_lsh"), 1).otherwise(0))
        .cast("long")
        .alias("t"),
    )
    # sequence(1, 0) is NOT empty in Spark (it steps backward), so the
    # i = 0 binomial C(n,0) = 1 is cased explicitly instead of folding
    p_num = F.expr(
        "2 * aggregate(sequence(0, least(w, l)), CAST(0 AS BIGINT), (acc, i) ->"
        " acc + (CASE WHEN i = 0 THEN CAST(1 AS BIGINT) ELSE"
        " aggregate(sequence(1, i), CAST(1 AS BIGINT),"
        " (c, j) -> (c * ((w + l) - j + 1)) div j) END))"
    )
    n = F.col("w") + F.col("l")
    return wl.select(
        n.alias("n_informative"),
        F.col("w").alias("ivf_wins"),
        F.col("l").alias("lsh_wins"),
        F.col("t").alias("ties"),
        F.round(
            F.least(p_num * 1.0 / F.pow(F.lit(2.0), n), F.lit(1.0)), 6
        ).alias("p_value"),
        F.when(n == 0, F.lit(False))
        .otherwise(F.lit(20) * p_num < F.pow(F.lit(2.0), n).cast("long"))
        .alias("significant_05"),
    )
