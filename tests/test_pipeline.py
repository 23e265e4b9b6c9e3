"""End-to-end pipeline tests: fan-out counts vs a pandas oracle, per-turn
text equality under (conv_id, turn_idx) ordering, and checkpoint/resume
idempotence (the FIXTURES.md §4/§5 golden flow)."""

import re

import pandas as pd
import pytest
from pyspark.sql import functions as F

from beats_spark.catalog import ParquetCatalog
from beats_spark.pipeline import (
    LINEAGE_TABLE,
    METRICS_TABLE,
    Pipeline,
    PipelineConfig,
    fixture_config,
)
from beats_spark.testdata import synthesize_transcripts, transcripts_from_events

SF_DIR = "/root/testdata/sf0.001"


def oracle_routes(pdf: pd.DataFrame) -> pd.Series:
    """Pure-pandas oracle for the fixture pipeline's routing."""
    kept = pdf[pdf["role"] != "system"]
    mapping = {"search": "sink_search", "code": "sink_code",
               "browser": "sink_browser", "none": "sink_other"}
    return kept["tool"].map(mapping).fillna("sink_other")


@pytest.fixture(scope="module")
def transcripts(spark):
    return transcripts_from_events(spark, SF_DIR).cache()


def test_transform_counts_match_pandas_oracle(spark, transcripts):
    pipe = Pipeline(spark, fixture_config())
    got = {
        r["_sink"]: r["cnt"]
        for r in pipe.transform(transcripts)
        .groupBy("_sink").agg(F.count("*").alias("cnt")).collect()
    }
    want = oracle_routes(transcripts.toPandas()).value_counts().to_dict()
    assert got == want


def test_parse_and_tags(spark, transcripts):
    pipe = Pipeline(spark, fixture_config())
    out = pipe.transform(transcripts)
    pdf = out.toPandas()
    # malformed rows: parse failed → null fields + dissect failure flag
    bad = pdf[pdf["text"].str.startswith("MALFORMED")]
    assert len(bad) > 0
    assert bad["parsed"].map(lambda s: s is None or s["level"] is None).all()
    # well-formed rows: parsed fields match a regex oracle
    ok = pdf[~pdf["text"].str.startswith("MALFORMED")]
    rx = re.compile(r'^level=(\S+) caller=(\S+) msg="([^"]*)" latency_ms=(\d+)$')
    for _, row in ok.head(50).iterrows():
        m = rx.match(row["text"])
        assert m
        assert row["parsed"]["level"] == m.group(1)
        assert row["parsed"]["origin"] == m.group(2)  # renamed caller→origin
        assert row["parsed"]["msg"] == m.group(3)
        assert row["parsed"]["latency"] == int(m.group(4))
        want_slow = int(m.group(4)) >= 100
        assert (row["tags"] is not None and "slow" in list(row["tags"])) == want_slow


def test_run_fanout_and_metrics(spark, transcripts, tmp_path):
    cat = ParquetCatalog(spark, str(tmp_path / "wh"))
    pipe = Pipeline(spark, fixture_config(), cat)
    res = pipe.run(transcripts, run_id="r1")

    want = oracle_routes(transcripts.toPandas()).value_counts().to_dict()
    assert res.sinks == want
    assert res.events_in == transcripts.count()
    assert res.events_dropped == res.events_in - sum(want.values())

    # sink tables hold exactly the routed rows; text preserved per-turn
    for sink, n in want.items():
        tbl = cat.read(sink)
        assert tbl.count() == n
    m = cat.read(METRICS_TABLE).toPandas()
    assert m[m["sink"].notna()]["events_routed"].sum() == sum(want.values())
    assert m[m["sink"].isna()]["events_in"].sum() == res.events_in
    assert m[m["sink"].isna()]["events_dropped"].sum() == res.events_dropped


def test_text_equality_stable_ordering(spark, transcripts, tmp_path):
    """Per-turn text equality under stable (conv_id, turn_idx) ordering —
    the BASELINE.json per-row invariant."""
    cat = ParquetCatalog(spark, str(tmp_path / "wh"))
    pipe = Pipeline(spark, fixture_config(), cat)
    pipe.run(transcripts, run_id="r1")
    sinks = ["sink_search", "sink_code", "sink_browser", "sink_other"]
    got = (
        cat.read(sinks[0]).select("conv_id", "turn_idx", "text")
        .unionByName(cat.read(sinks[1]).select("conv_id", "turn_idx", "text"))
        .unionByName(cat.read(sinks[2]).select("conv_id", "turn_idx", "text"))
        .unionByName(cat.read(sinks[3]).select("conv_id", "turn_idx", "text"))
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    want = (
        transcripts.filter(F.col("role") != "system")
        .select("conv_id", "turn_idx", "text")
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True))


def test_checkpoint_resume_idempotent(spark, transcripts, tmp_path):
    cat = ParquetCatalog(spark, str(tmp_path / "wh"))
    # source lands in two snapshots
    half1 = transcripts.filter(F.col("conv_id") < "conv-000007")
    half2 = transcripts.filter(F.col("conv_id") >= "conv-000007")
    cat.append(half1, "transcripts")
    pipe = Pipeline(spark, fixture_config(), cat)

    r1 = pipe.run_incremental("transcripts", run_id="r1")
    assert not r1.skipped and len(r1.snapshot_ids) == 1
    # no new data → no-op, nothing double-appended
    r2 = pipe.run_incremental("transcripts", run_id="r2")
    assert r2.skipped and r2.events_in == 0

    cat.append(half2, "transcripts")
    r3 = pipe.run_incremental("transcripts", run_id="r3")
    assert not r3.skipped and len(r3.snapshot_ids) == 1

    # total routed across both runs == single-shot oracle
    want = oracle_routes(transcripts.toPandas()).value_counts().to_dict()
    got = {s: cat.read(s).count() for s in want}
    assert got == want
    lineage = cat.read(LINEAGE_TABLE).toPandas()
    assert set(lineage["run_id"]) == {"r1", "r3"}
    assert len(lineage) == 2


def test_synthesize_transcripts_deterministic(spark):
    a = synthesize_transcripts(spark, n_turns=2000, n_convs=50, partitions=4)
    b = synthesize_transcripts(spark, n_turns=2000, n_convs=50, partitions=13)
    pa = a.orderBy("conv_id", "turn_idx").toPandas()
    pb = b.orderBy("conv_id", "turn_idx").toPandas()
    pd.testing.assert_frame_equal(pa, pb)
    assert pa["conv_id"].nunique() == 50
    # hot key skew present
    assert (pa["conv_id"] == "conv-000000").mean() > 0.15
    # turn_idx dense per conv
    g = pa.groupby("conv_id")["turn_idx"]
    assert (g.min() == 0).all()
    assert (g.max() + 1 == g.count()).all()


def test_dissect_jvm_pandas_engines_agree(spark, transcripts):
    """The JVM fast path (anchored regex, codegen) and the pandas-UDF path
    must produce identical structs on eligible tokenizers."""
    from beats_spark.processors import apply_chain, build_chain

    tok = ('level=%{level} caller=%{caller} msg="%{msg}" '
           'latency_ms=%{latency|integer}')
    outs = []
    for engine in ("jvm", "pandas"):
        stages = build_chain([
            {"dissect": {"tokenizer": tok, "field": "text",
                         "target_prefix": "p", "ignore_failure": True,
                         "engine": engine}},
        ])
        df = apply_chain(transcripts, stages)
        outs.append(
            df.select("conv_id", "turn_idx", "p.*")
            .orderBy("conv_id", "turn_idx").toPandas()
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_crash_recovery_rollback(spark, transcripts, tmp_path):
    """A run that died between sink commits and its lineage commit must be
    detectable and removable, after which resume reprocesses cleanly with
    no double-append (the WAP/branch transaction analogue)."""
    from beats_spark.catalog import ParquetCatalog as PC

    cat = PC(spark, str(tmp_path / "wh"))
    cat.append(transcripts, "transcripts")
    pipe = Pipeline(spark, fixture_config(), cat)

    # simulate the crash: run the fan-out but strip the lineage commit
    real_append = cat.append

    def dying_append(df, table, run_id=None):
        if table == LINEAGE_TABLE:
            raise RuntimeError("crash before lineage commit")
        return real_append(df, table, run_id=run_id)

    cat.append = dying_append
    src_snap = cat.snapshots("transcripts")[0].snapshot_id
    with pytest.raises(RuntimeError):
        pipe.run(cat.read("transcripts"), run_id="crashed",
                 source_snapshots=[src_snap])
    cat.append = real_append

    # sinks hold the orphan data; lineage does not know the run
    assert "crashed" in cat.incomplete_runs()
    removed = cat.rollback_run("crashed")
    assert sum(removed.values()) > 0
    assert cat.incomplete_runs() == set()

    # clean resume: counts equal the single-shot oracle, nothing doubled
    r = pipe.run_incremental("transcripts", run_id="retry")
    want = oracle_routes(transcripts.toPandas()).value_counts().to_dict()
    assert r.sinks == want
    assert {s: cat.read(s).count() for s in want} == want


def test_dissect_jvm_append_parity(spark):
    """JVM fast path now covers append (+key / +key/N ordinal) — must equal
    the pandas path on append, greedy padding, and fixed-length."""
    from beats_spark.processors import apply_chain, build_chain

    rows = [
        ("john smith BOB 12 X",),
        ("a b C 7 Y",),
        ("nomatch",),
    ]
    df = spark.createDataFrame(rows, "text string")
    tok = "%{+name} %{+name} %{flag} %{n|integer} %{tail}"
    outs = []
    for engine in ("jvm", "pandas"):
        stages = build_chain([
            {"dissect": {"tokenizer": tok, "field": "text",
                         "target_prefix": "p", "ignore_failure": True,
                         "engine": engine}},
        ])
        out = apply_chain(df, stages)
        outs.append(out.select("text", "p.*").orderBy("text").toPandas())
    pd.testing.assert_frame_equal(outs[0], outs[1])
    got = outs[0].set_index("text")
    assert got.loc["john smith BOB 12 X", "name"] == "john smith"
    assert got.loc["john smith BOB 12 X", "n"] == 12


def test_dissect_jvm_append_ordinal_parity(spark):
    from beats_spark.processors import apply_chain, build_chain

    df = spark.createDataFrame([("b a",)], "text string")
    tok = "%{+name/2} %{+name/1}"
    outs = []
    for engine in ("jvm", "pandas"):
        stages = build_chain([
            {"dissect": {"tokenizer": tok, "field": "text",
                         "target_prefix": "p", "ignore_failure": True,
                         "engine": engine}},
        ])
        outs.append(apply_chain(df, stages).select("p.name").toPandas())
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert outs[0]["name"][0] == "a b"  # ordinal reorders the appends


def test_cluster_by_orders_files(spark, transcripts, tmp_path):
    """cluster_by sorts rows within each written file so parquet row-group
    stats prune (conv_id, turn_idx) range reads."""
    cfg = fixture_config()
    cfg.cluster_by = ["conv_id", "turn_idx"]
    cat = ParquetCatalog(spark, str(tmp_path / "wh"))
    Pipeline(spark, cfg, cat).run(transcripts.repartition(2), run_id="c")
    import glob as g
    files = g.glob(str(tmp_path / "wh" / "sink_search" / "data" / "*" / "*.parquet"))
    assert files
    import pandas as pd_
    for f in files:
        pdf = pd_.read_parquet(f)[["conv_id", "turn_idx"]]
        assert pdf.equals(pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))


def test_direct_run_commits_lineage(spark, transcripts, tmp_path):
    """Every run commits a lineage row (NULL snapshot_id for direct runs) so
    incomplete_runs() never misclassifies a committed direct run as crashed —
    a rollback after such a misclassification would delete valid sink data."""
    cat = ParquetCatalog(spark, str(tmp_path / "wh"))
    pipe = Pipeline(spark, fixture_config(), cat)
    pipe.run(transcripts, run_id="direct1")
    assert cat.incomplete_runs() == set()
    row = (cat.read(LINEAGE_TABLE)
           .filter(F.col("run_id") == "direct1").collect())
    assert len(row) == 1 and row[0]["snapshot_id"] is None
    # and rollback_run on a completed run id is therefore never triggered by
    # the incomplete_runs() recovery loop; the sink data stays
    assert cat.read("sink_search").count() > 0


def test_staging_leftover_is_cleared_on_retry(spark, transcripts, tmp_path):
    """A crash between the staging write and adoption leaves _staging_<run>;
    a retried run with the same run_id (e.g. a replayed streaming batch) must
    clear it and succeed instead of failing forever with path-exists."""
    import os
    wh = str(tmp_path / "wh")
    cat = ParquetCatalog(spark, wh)
    staging = os.path.join(wh, "_staging_replay7")
    os.makedirs(staging)
    with open(os.path.join(staging, "_SUCCESS"), "w"):
        pass
    pipe = Pipeline(spark, fixture_config(), cat)
    r = pipe.run(transcripts, run_id="replay7")
    assert sum(r.sinks.values()) > 0
    assert not os.path.exists(staging)


def test_rollback_removes_staging_dir(spark, tmp_path):
    import os
    wh = str(tmp_path / "wh")
    cat = ParquetCatalog(spark, wh)
    staging = os.path.join(wh, "_staging_dead")
    os.makedirs(staging)
    cat.rollback_run("dead")
    assert not os.path.exists(staging)


def test_all_rows_dropped_run_commits_empty(spark, transcripts, tmp_path):
    """drop_event removing every row must still commit metrics + lineage
    (events_dropped == events_in), not crash on schema inference of an
    empty staging dir."""
    cfg = PipelineConfig(
        processors=[{"drop_event": {"when": {"has_fields": ["conv_id"]}}}],
        routes=[{"sink": "s_%{[role]}"}],
    )
    cat = ParquetCatalog(spark, str(tmp_path / "wh"))
    r = Pipeline(spark, cfg, cat).run(transcripts, run_id="all-dropped")
    assert r.sinks == {}
    assert r.events_in == transcripts.count()
    assert r.events_dropped == r.events_in
    m = cat.read(METRICS_TABLE).filter(F.col("run_id") == "all-dropped")
    agg = m.agg(F.sum("events_in").alias("i"),
                F.sum("events_dropped").alias("d")).collect()[0]
    assert agg["i"] == r.events_in and agg["d"] == r.events_in
    assert cat.incomplete_runs() == set()


def test_run_incremental_rolls_back_crashed_run(spark, transcripts, tmp_path):
    """A run that crashed between sink adoption and its lineage commit must
    be rolled back by the NEXT resume, not double-appended."""
    cat = ParquetCatalog(spark, str(tmp_path / "wh"))
    cat.append(transcripts, "transcripts")
    pipe = Pipeline(spark, fixture_config(), cat)
    src_snap = cat.snapshots("transcripts")[0].snapshot_id

    real_append = cat.append

    def dying_append(df, table, run_id=None):
        if table == LINEAGE_TABLE:
            raise RuntimeError("crash before lineage commit")
        return real_append(df, table, run_id=run_id)

    cat.append = dying_append
    with pytest.raises(RuntimeError):
        pipe.run(cat.read("transcripts"), run_id="crashed",
                 source_snapshots=[src_snap])
    cat.append = real_append

    r = pipe.run_incremental("transcripts", run_id="retry")
    want = oracle_routes(transcripts.toPandas()).value_counts().to_dict()
    assert r.sinks == want
    # exactly ONE copy in every sink — the crashed run's orphans are gone
    assert {s: cat.read(s).count() for s in want} == want


def test_run_scans_input_exactly_once(spark, transcripts, tmp_path):
    """The production run() path must read its input ONCE: lineage counters
    ride the staging write via df.observe, not a separate pre-count job.
    Measured directly — an accumulator counts every row that crosses a
    pass-through stage injected at the source; 2x the input means a second
    scan (the r4 read-amplification finding)."""
    rows_seen = spark.sparkContext.accumulator(0)
    schema = transcripts.schema

    def passthrough(it):
        for pdf in it:
            rows_seen.add(len(pdf))
            yield pdf

    src = transcripts.mapInPandas(passthrough, schema)
    cat = ParquetCatalog(spark, str(tmp_path / "wh"))
    res = Pipeline(spark, fixture_config(), cat).run(src, run_id="onescan")
    n = transcripts.count()
    assert res.events_in == n
    assert rows_seen.value == n, (
        f"input scanned {rows_seen.value / n:.2f}x (expected exactly 1x)"
    )
    # and the metrics table still balances: in == routed + dropped
    m = cat.read(METRICS_TABLE).filter(F.col("run_id") == "onescan").toPandas()
    assert m[m["sink"].isna()]["events_in"].sum() == n
    assert (m[m["sink"].isna()]["events_dropped"].sum()
            + m[m["sink"].notna()]["events_routed"].sum()) == n


def test_events_in_correct_with_plan_time_sampling_stage(spark, transcripts,
                                                         tmp_path):
    """PySpark Observation captures only the FIRST action on its node; a
    schema-less decode_json_fields runs a limit(1) sampling collect DURING
    transform(), which would freeze events_in at the sample job's partial
    count (often 1). run() must detect the consumed observation and fall
    back to a real count (r5 review finding)."""
    src = transcripts.withColumn(
        "raw", F.concat(F.lit('{"k":'), F.col("turn_idx").cast("string"),
                        F.lit("}")))
    cfg = PipelineConfig(
        processors=[
            {"decode_json_fields": {"fields": ["raw"]}},  # no schema → sample
            {"drop_event": {"when": {"equals": {"role": "system"}}}},
        ],
        routes=[{"sink": "s_%{[tool]}"}],
    )
    cat = ParquetCatalog(spark, str(tmp_path / "wh"))
    res = Pipeline(spark, cfg, cat).run(src, run_id="sampled")
    n = transcripts.count()
    assert res.events_in == n
    assert sum(res.sinks.values()) + res.events_dropped == n


def test_catalog_read_unknown_snapshot_raises(spark, transcripts, tmp_path):
    cat = ParquetCatalog(spark, str(tmp_path / "wh"))
    s = cat.append(transcripts, "t")
    with pytest.raises(ValueError, match="unknown snapshot"):
        cat.read("t", [s.snapshot_id, "bogus"])
