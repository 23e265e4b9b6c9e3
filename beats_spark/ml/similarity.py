"""Similarity search over an embedding column (array<float>).

Two tiers:
- ``cosine_topk``: brute-force scan — the correctness baseline. One narrow
  pass (dot product via ``F.zip_with`` + ``F.aggregate``, pure JVM) and a
  global top-k (TakeOrdered — per-partition heaps, only k rows per partition
  reach the driver; no full sort, no shuffle of the corpus).
- ``lsh_topk``: random-hyperplane LSH — the scale path. Corpus bucket
  signatures come from a relational pass (posexplode → codegen'd per-plane
  sum-aggregates → id-keyed join back; see ``_bucket_projs``) — one extra
  id-shuffle, but zero interpreted higher-order functions on the corpus.
  The query's own bucket is evaluated once on a synthetic row at plan time
  (a 1-row job) and inlined as a literal so the probe filter is a pure
  codegen bit_count. The probe scans ~corpus/2^planes rows per probe; at
  100 TB the corpus would be WRITTEN partitioned by bucket so the probe
  prunes file scans instead. Hyperplane coefficients are deterministic
  integer hashes (no RNG shipping, reproducible at any parallelism).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# ---------------------------------------------------------------------------
# vector math, pure JVM
# ---------------------------------------------------------------------------


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# deterministic "random" hyperplane coefficient in [-1, 1): plane p, dim d.
# coef_hash='xx' mixes with xxhash64 (production default); 'poly' hashes
# the DECIMAL-STRING of the index polynomially — digit decomposition is
# nonlinear, so consecutive (p, d) don't produce arithmetic-progression
# coefficients (a purely multiplicative mix does, and correlated planes
# wreck LSH recall) — and the same arithmetic is DuckDB-replicable, giving
# hyperplane-bucketed queries a value-level oracle.
def _plane_coef(p: int, d: Column, coef_hash: str = "xx") -> Column:
    if coef_hash == "xx":
        mixed = F.xxhash64(F.lit(p) * 16384 + d)
    else:
        from beats_spark.ml.dedup import poly_string_hash

        mixed = poly_string_hash(
            (F.lit(p).cast("long") * 16384 + d + 1).cast("string")
        )
    return (F.pmod(mixed, F.lit(2000)).cast("double") - F.lit(1000.0)) / F.lit(1000.0)


def hyperplane_bucket(vec: Column, num_planes: int = 8,
                      coef_hash: str = "xx") -> Column:
    """Sign-bit signature of ``vec`` against ``num_planes`` deterministic
    hyperplanes, packed into a bigint bucket id.

    Column form for single-expression use (e.g. one query vector). For a
    whole CORPUS use :func:`hyperplane_buckets` — this form evaluates
    interpreted higher-order functions, O(planes × dims) per row."""
    out = F.lit(0).cast("long")
    for p in range(num_planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.transform(F.sequence(F.lit(0), F.size(vec) - 1),
                            lambda d: _plane_coef(p, d, coef_hash)),
                lambda x, c: x * c,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        out = out + F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(F.lit(0).cast("long"))
    return out


def _poly_coef_py(p: int, d: int) -> float:
    """Exact Python replica of _plane_coef for coef_hash='poly' — pure
    integer arithmetic plus one final float subtract/divide, so the value
    is bit-identical to the Spark/DuckDB derivation."""
    from beats_spark.ml.dedup import POLY_P

    acc = 7
    for ch in str(p * 16384 + d + 1):
        acc = (acc * 31 + ord(ch)) % POLY_P
    return (float(acc % 2000) - 1000.0) / 1000.0


def _bucket_projs(base: DataFrame, num_planes: int,
                  coef_hash: str) -> DataFrame:
    """(__id, __bkt) for ids of ``base`` (columns __id, __v) whose vector
    has at least one element — the caller left-joins and coalesces to 0 for
    empty/NULL vectors (the Column form's empty fold). A vector containing
    a NULL ELEMENT also gets bucket 0: the Column form's fold nullifies the
    whole projection, where a plain sum() would silently skip it.

    posexplode once, then ``num_planes`` codegen'd sum-aggregates; sign
    bits packed with the shared helper. coef_hash='xx' derives the
    coefficient inline from the element position (pure codegen SQL).
    coef_hash='poly' joins a broadcast coefficient table precomputed in
    Python (bit-identical integer arithmetic) — deriving it inline would
    run an interpreted aggregate/split character fold per element per
    plane, which is the exact interpretation this relational form exists
    to remove."""
    from beats_spark.ml.dedup import pack_sign_bits_sql

    ex = base.select("__id", F.posexplode("__v").alias("__pos", "__x"))
    if coef_hash == "xx":
        prods = [
            f"sum(__x * ((CAST(pmod(xxhash64({p * 16384} + __pos), 2000) "
            f"AS DOUBLE) - 1000.0) / 1000.0))"
            for p in range(num_planes)
        ]
    else:
        dims = base.agg(F.max(F.size("__v"))).first()[0] or 0
        spark = base.sparkSession
        coefs = spark.createDataFrame(
            [(d, *[_poly_coef_py(p, d) for p in range(num_planes)])
             for d in range(dims)],
            ["__pos", *[f"__k{p}" for p in range(num_planes)]],
        )
        ex = ex.join(F.broadcast(coefs), "__pos")
        prods = [f"sum(__x * __k{p})" for p in range(num_planes)]
    projs = ex.groupBy("__id").agg(
        F.expr("sum(CASE WHEN __x IS NULL THEN 1 ELSE 0 END)").alias("__nn"),
        *[F.expr(prods[p]).alias(f"__p{p}") for p in range(num_planes)],
    )
    return projs.select(
        "__id",
        F.expr(f"CASE WHEN __nn > 0 THEN CAST(0 AS BIGINT) "
               f"ELSE {pack_sign_bits_sql('__p', num_planes)} END"
               ).alias("__bkt"),
    )


def hyperplane_buckets(df: DataFrame, vec_col: str = "embedding",
                       id_col: str = "vec_id", num_planes: int = 8,
                       coef_hash: str = "xx") -> DataFrame:
    """(id, __bkt) for every corpus row — same values as the Column form
    (including bucket 0 for empty, NULL, and NULL-element vectors),
    computed relationally via :func:`_bucket_projs`. Callers that already
    hold an (id, vec) projection should join ``_bucket_projs`` directly
    instead of calling this (it re-selects from df for the id spine)."""
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    return (
        base.select("__id")
        .join(_bucket_projs(base, num_planes, coef_hash), "__id", "left")
        .select("__id",
                F.coalesce("__bkt", F.lit(0).cast("long")).alias("__bkt"))
    )


# ---------------------------------------------------------------------------
# search
# ---------------------------------------------------------------------------


def cosine_topk(
    corpus: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_id: int | None = None,
) -> DataFrame:
    """Brute-force top-k by cosine similarity to a constant query vector.

    Returns (id, score) ordered by (score desc, id) — the id tiebreak keeps
    results deterministic. ``orderBy().limit(k)`` compiles to TakeOrdered:
    no global sort at any scale.
    """
    q = F.lit(query_vec).cast("array<double>")
    df = corpus.select(
        F.col(id_col),
        cosine(F.col(vec_col).cast("array<double>"), q).alias("score"),
    )
    if exclude_id is not None:
        df = df.filter(F.col(id_col) != exclude_id)
    return (
        df.orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, F.round("score", 6).alias("score"))
    )


def lsh_topk(
    corpus: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = 8,
    probe_hamming: int = 2,
    exclude_id: int | None = None,
    coef_hash: str = "xx",
) -> DataFrame:
    """ANN top-k: scan only corpus rows whose hyperplane bucket is within
    ``probe_hamming`` bits of the query's bucket (multi-probe LSH), then
    exact cosine + top-k inside the probed slice.

    At 100 TB the corpus would be written bucketed/partitioned by the
    signature so the probe prunes file scans via partition pruning; here the
    filter is computed on the fly (bit_count is codegen'd).
    """
    q = F.lit(query_vec).cast("array<double>")
    vec = F.col(vec_col).cast("array<double>")
    ids = corpus.select(F.col(id_col).alias("__id"), vec.alias("__v"))
    base = (
        ids.join(_bucket_projs(ids, num_planes, coef_hash), "__id", "left")
        .select(F.col("__id").alias(id_col), "__v",
                F.coalesce("__bkt", F.lit(0).cast("long")).alias("__bkt"))
    )
    # the query's bucket is ONE value: evaluate the Column form on a
    # single synthetic row and inline the result as a literal — leaving it
    # as an expression re-runs the interpreted plane fold on EVERY corpus
    # row inside the filter (HOFs are not constant-folded)
    spark = corpus.sparkSession
    qb_val = spark.range(1).select(
        hyperplane_bucket(q, num_planes, coef_hash).alias("b")
    ).collect()[0]["b"]
    probed = base.filter(
        F.bit_count(F.col("__bkt").bitwiseXOR(F.lit(qb_val))) <= probe_hamming)
    if exclude_id is not None:
        probed = probed.filter(F.col(id_col) != exclude_id)
    return (
        probed.select(F.col(id_col), cosine(F.col("__v"), q).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, F.round("score", 6).alias("score"))
    )


def write_bucketed(
    corpus: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = 8,
    coef_hash: str = "xx",
) -> None:
    """Materialize the corpus hive-partitioned by its hyperplane bucket —
    the 100 TB layout ``lsh_topk``'s docstring promises: a probe against
    the written table prunes whole bucket DIRECTORIES at file-listing time
    (the ``__bkt`` predicate lands in the scan's ``PartitionFilters``), so
    a probe reads ~``C(planes, ≤hamming)/2^planes`` of the corpus bytes
    instead of filtering rows after a full scan.

    One signature pass (the relational ``_bucket_projs``), one id-join,
    one partitioned write. 2^num_planes directories — keep num_planes
    moderate (8 → 256 partitions) so files stay large at scale."""
    base = corpus.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"))
    # _bucket_projs directly (not hyperplane_buckets, whose internal id-
    # spine join would make this TWO corpus-sized joins): one signature
    # pass, one left join, NULL/empty vectors coalesce to bucket 0
    b = _bucket_projs(base, num_planes, coef_hash) \
        .withColumnRenamed("__id", id_col)
    (corpus.join(b, id_col, "left")
     .withColumn("__bkt", F.coalesce(F.col("__bkt"), F.lit(0).cast("long")))
     .write.partitionBy("__bkt").mode("overwrite").parquet(path))


def lsh_topk_bucketed(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = 8,
    probe_hamming: int = 2,
    exclude_id: int | None = None,
    coef_hash: str = "xx",
) -> DataFrame:
    """``lsh_topk`` over a :func:`write_bucketed` corpus. Identical
    results; the bucket probe becomes a PARTITION filter (it references
    only the partition column), so unprobed buckets are never read."""
    q = F.lit(query_vec).cast("array<double>")
    qb_val = spark.range(1).select(
        hyperplane_bucket(q, num_planes, coef_hash).alias("b")
    ).collect()[0]["b"]
    df = spark.read.parquet(path)
    probed = df.filter(
        F.bit_count(F.col("__bkt").cast("long").bitwiseXOR(F.lit(qb_val)))
        <= probe_hamming)
    if exclude_id is not None:
        probed = probed.filter(F.col(id_col) != exclude_id)
    return (
        probed.select(
            F.col(id_col),
            cosine(F.col(vec_col).cast("array<double>"), q).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, F.round("score", 6).alias("score"))
    )


def ivf_topk(
    corpus: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    n_probe: int = 2,
) -> DataFrame:
    """IVF-style ANN when a coarse quantizer already exists (a cluster
    ``label`` column, as produced by any offline k-means): probe the
    ``n_probe`` centroids nearest to the query (centroids = per-label mean,
    computed with one small agg), then exact top-k within probed cells."""
    vec = F.col(vec_col).cast("array<double>")
    q = F.lit(query_vec).cast("array<double>")

    # element-wise mean per label: posexplode → avg per (label, pos) →
    # reassemble ordered. The exploded frame is tiny relative to the corpus
    # (dims × rows of 3 columns) and aggregates map-side first.
    cents = (
        corpus.select(F.col(label_col).alias("lbl"), F.posexplode(vec).alias("pos", "x"))
        .groupBy("lbl", "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy("lbl")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("lbl", F.transform(F.col("pm"), lambda s: s["m"]).alias("centroid"))
    )
    probe = [
        r["lbl"]
        for r in cents.select(
            "lbl", cosine(F.col("centroid"), q).alias("s")
        ).orderBy(F.col("s").desc()).limit(n_probe).collect()
    ]
    return (
        corpus.filter(F.col(label_col).isin(probe))
        .select(F.col(id_col), cosine(vec, q).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, F.round("score", 6).alias("score"))
    )
