"""Plan-quality regression tests: the physical plans we'd want at 100 TB.

These pin the Catalyst properties the scale story depends on:
- predicate pushdown + column pruning reach the parquet scan,
- enrich compiles to a broadcast hash join (map-side, no shuffle of facts),
- the JVM dissect path keeps the whole pipeline out of Python,
- the condition language compiles into ONE filter (pushable),
- salted repartition spreads the hot conversation.
"""

import pytest
from pyspark.sql import functions as F

from beats_spark.pipeline import Pipeline, PipelineConfig, fixture_config
from beats_spark.testdata import synthesize_transcripts, tools_lookup_df

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def tdir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("plans") / "transcripts"
    synthesize_transcripts(spark, 20_000, 200).write.parquet(str(d))
    return str(d)


def test_filter_pushdown_and_pruning(spark, tdir):
    df = (
        spark.read.parquet(tdir)
        .filter(F.col("role") == "user")
        .select("conv_id", "text")
    )
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(role), EqualTo(role,user)]" in plan
    # pruned read schema: only the needed columns reach the scan
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" in read_schema and "conv_id" in read_schema
    assert "latency" not in read_schema and "ts" not in read_schema


def test_conditions_compile_to_pushable_filter(spark, tdir):
    from beats_spark.conditions import compile_condition

    df = spark.read.parquet(tdir)
    cond = compile_condition(df, {
        "and": [{"equals": {"role": "user"}},
                {"range": {"turn_idx": {"gte": 1, "lt": 50}}}]
    })
    plan = plan_of(df.filter(cond).select("conv_id"))
    # all three conjuncts reached the parquet scan as pushed filters
    assert "EqualTo(role,user)" in plan
    assert "GreaterThanOrEqual(turn_idx,1)" in plan
    # plan toString elides long filter lists ("LessTh...") — prefix is enough
    assert "LessTh" in plan


def test_enrich_is_broadcast_join(spark, tdir):
    from beats_spark.processors import build_stage
    from beats_spark.processors.enrich import register_lookup

    register_lookup("tools", lambda: tools_lookup_df(spark))
    df = spark.read.parquet(tdir)
    out = build_stage("enrich", {"lookup": "tools", "on": "tool",
                                 "target": "tool_meta"}).apply(df)
    plan = plan_of(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_jvm_pipeline_has_no_python(spark, tdir):
    pipe = Pipeline(spark, fixture_config())
    out = pipe.transform(spark.read.parquet(tdir))
    plan = plan_of(out)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "*(1)" in plan  # the WholeStageCodegen stage marker


def test_pandas_dissect_is_arrow_not_rowwise(spark, tdir):
    from beats_spark.processors import build_stage

    st = build_stage("dissect", {
        "tokenizer": "%{a} %{b->} %{+c} %{+c}", "field": "text",
        "target_prefix": "p", "ignore_failure": True, "engine": "pandas",
    })
    plan = plan_of(st.apply(spark.read.parquet(tdir)))
    assert "ArrowEvalPython" in plan       # vectorized pandas UDF
    assert "BatchEvalPython" not in plan   # never row-at-a-time Python


def test_salting_spreads_hot_conversation(spark, tdir):
    """20% of rows share conv-000000; salted repartition must spread them
    across many partitions (the skew story for hot conv_ids)."""
    cfg = PipelineConfig(processors=[], routes=[{"sink": "x"}],
                         salt_column="conv_id", salt_buckets=16,
                         repartition=16)
    pipe = Pipeline(spark, cfg)
    out = pipe.transform(spark.read.parquet(tdir))
    dist = (
        out.filter(F.col("conv_id") == "conv-000000")
        .withColumn("p", F.spark_partition_id())
        .groupBy("p").count().collect()
    )
    assert len(dist) >= 8  # hot key occupies many partitions, not one
    counts = [r["count"] for r in dist]
    assert max(counts) < sum(counts) * 0.5


def test_unsalted_hot_key_is_skewed(spark, tdir):
    """Control: plain repartition BY conv_id alone lands the hot key in ONE
    partition — the failure mode salting exists to fix."""
    df = spark.read.parquet(tdir).repartition(16, F.col("conv_id"))
    dist = (
        df.filter(F.col("conv_id") == "conv-000000")
        .withColumn("p", F.spark_partition_id())
        .groupBy("p").count().collect()
    )
    assert len(dist) == 1


def test_topk_is_take_ordered(spark):
    """cosine_topk's orderBy().limit(k) must compile to TakeOrderedAndProject
    (per-partition heaps), never a global Sort."""
    from beats_spark.ml.similarity import cosine_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = [0.1] * 64
    plan = plan_of(cosine_topk(emb, q, k=5))
    assert "TakeOrderedAndProject" in plan


def test_syslog_is_pure_jvm(spark):
    from beats_spark.processors import apply_chain, build_chain

    df = spark.createDataFrame(
        [("<34>Oct 11 22:14:15 h su[1]: m",)], "message string")
    out = apply_chain(df, build_chain([{"syslog": {}}]))
    plan = plan_of(out)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_container_reader_is_pure_jvm(spark, tmp_path):
    from beats_spark.sources import read_container_logs

    (tmp_path / "c.log").write_text(
        '{"log":"x\\n","stream":"stdout","time":"2024-01-01T00:00:01Z"}\n')
    plan = plan_of(read_container_logs(spark, str(tmp_path), glob="*.log"))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_minhash_candidates_checkpointed_no_python(spark):
    """The candidate generation must complete eagerly with the banded
    frame cached only transiently (no persisted DataFrames leak from the
    operator), and the returned verification plan must consume the
    materialized id-pairs (ExistingRDD scan), never Python."""
    from beats_spark.ml.dedup import minhash_lsh_pairs

    docs = spark.createDataFrame(
        [(i, f"w{i} a b c d e f g h") for i in range(30)],
        "doc_id int, text string")
    jvm_cache = spark._jsparkSession.sharedState().cacheManager()
    # count cached entries via the public surface: lookupCachedData on the
    # banded plan would need the frame; instead compare global emptiness
    # deltas (other suites may hold their own cached fixtures)
    was_empty = jvm_cache.isEmpty()
    pairs = minhash_lsh_pairs(docs, jaccard_threshold=0.9)
    plan = plan_of(pairs)
    assert "ExistingRDD" in plan            # checkpointed candidate pairs
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # the operator's transient banded cache was dropped before returning:
    # it must not have changed the cache-manager state it found
    assert jvm_cache.isEmpty() == was_empty
    pairs.count()
