"""The pipeline: config → composed DataFrame plan → fan-out run.

Replaces the reference's harvester → processor chain → publisher → output
path (filebeat/beater/filebeat.go:220, libbeat/publisher/pipeline/client.go:83)
with one declarative Spark job:

    incremental read (snapshot range)           # registrar resume semantics
      → processor chain (one fused projection per stage)
      → salted repartition on hot conv_ids      # skew control
      → _sink column (outil.Selector, first-match-wins)
      → ONE partitioned write, per-sink dirs adopted as table snapshots
      → metrics + lineage commit                # monitoring.go counters

Fan-out is single-pass: the reference publishes each batch once to one output
(load-balanced), we write each row once via ``partitionBy(_sink)`` — no
per-sink re-scan of the transformed frame. Metrics re-aggregate the *written*
parquet (cheap columnar count) so reported counts are what actually landed,
not what the plan promised — the analogue of ack-based counters
(pipeline/monitoring.go:92-104: events.total/filtered/published).

Exactly-once resume: each processed source snapshot id is recorded in the
``lineage`` table inside the same run; a re-run sees it and skips — the
registrar's offset checkpoint (filebeat/registrar/registrar.go:139-194)
re-expressed as table state.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, Observation, SparkSession, functions as F, types as T

from beats_spark.catalog import ParquetCatalog
from beats_spark.processors import apply_chain, build_chain
from beats_spark.schema import META_PREFIX, PID_COL, SINK_COL
from beats_spark.selector import compile_selector

DEAD_LETTER = "dead_letter"
METRICS_TABLE = "pipeline_metrics"
LINEAGE_TABLE = "lineage"

# characters Spark escapes in partition directory names
# (ExternalCatalogUtils.charToEscape) — adoption must look up the ESCAPED dir
_ESCAPED_CHARS = (
    {chr(i) for i in range(0x20)} | {chr(0x7F)} | set('"#%\'*/:=?\\{[]^')
)


def escape_path_name(value: str) -> str:
    return "".join(
        f"%{ord(c):02X}" if c in _ESCAPED_CHARS else c for c in value
    )


@dataclass
class PipelineConfig:
    """Shaped like a filebeat YAML: ``processors`` list + ``output.routes``."""

    processors: list[dict[str, Any]] = field(default_factory=list)
    routes: list[dict[str, Any]] = field(default_factory=list)
    fallback_sink: str | None = None      # constant last rule; None → dead_letter
    dead_letter: str = DEAD_LETTER
    # skew control: repartition on (conv_id, salt) before wide stages.
    salt_column: str | None = None        # e.g. "conv_id"
    salt_buckets: int = 0                 # 0 = off
    repartition: int | None = None
    # write clustering: sortWithinPartitions before the fan-out write so
    # per-sink files are ordered by the stable key (parquet row-group
    # min/max stats then prune (conv_id, turn_idx) range scans — the
    # reference's per-file offset ordering, §2.7)
    cluster_by: list[str] = field(default_factory=list)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "PipelineConfig":
        out = d.get("output", {})
        return cls(
            processors=d.get("processors", []),
            routes=out.get("routes", d.get("routes", [])),
            fallback_sink=out.get("fallback", d.get("fallback")),
            dead_letter=out.get("dead_letter", DEAD_LETTER),
            salt_column=d.get("salt_column"),
            salt_buckets=int(d.get("salt_buckets", 0)),
            repartition=d.get("repartition"),
            cluster_by=list(d.get("cluster_by", [])),
        )


@dataclass
class RunResult:
    run_id: str
    sinks: dict[str, int]          # sink table → rows routed this run
    events_in: int
    events_dropped: int
    snapshot_ids: list[str]        # source snapshots consumed (resume mode)
    skipped: bool = False          # True when nothing new to process


class Pipeline:
    def __init__(self, spark: SparkSession, config: PipelineConfig,
                 catalog: ParquetCatalog | None = None):
        self.spark = spark
        self.config = config
        self.catalog = catalog
        self.stages = build_chain(config.processors)

    # -- pure plan (unit-testable, no IO) -----------------------------------

    def transform(self, df: DataFrame) -> DataFrame:
        """processor chain + routing; adds ``_sink`` (never null: unroutable
        rows go to the dead-letter table, mirroring ES dead_letter_index,
        outputs/elasticsearch/non_indexable_policy.go:31-73)."""
        cfg = self.config
        if cfg.salt_buckets and cfg.salt_column:
            n = cfg.repartition or self.spark.sparkContext.defaultParallelism * 2
            # salt from row CONTENT (turn_idx when present, else all columns)
            # so placement is deterministic under task retries — a
            # monotonically_increasing_id salt would reshuffle on recompute
            salt_src = (F.col("turn_idx") if "turn_idx" in df.columns
                        else F.struct(*[F.col(c) for c in df.columns]))
            df = df.repartition(
                n, F.col(cfg.salt_column),
                F.pmod(F.xxhash64(salt_src), F.lit(cfg.salt_buckets)),
            )
        elif cfg.repartition:
            df = df.repartition(cfg.repartition)
        df = apply_chain(df, self.stages)
        sink = compile_selector(df, cfg.routes, fallback=cfg.fallback_sink)
        return df.withColumn(SINK_COL, F.coalesce(sink, F.lit(cfg.dead_letter)))

    # -- full run ------------------------------------------------------------

    def run(self, df: DataFrame, run_id: str | None = None,
            source_snapshots: list[str] | None = None,
            source_table: str = "transcripts") -> RunResult:
        if self.catalog is None:
            raise ValueError("run() needs a catalog; use transform() for plan-only")
        run_id = run_id or uuid.uuid4().hex[:12]
        cat = self.catalog

        # tag the input partition once, at the scan, for per-partition lineage
        df = df.withColumn(PID_COL, F.spark_partition_id())
        # SINGLE-PASS lineage: events_in is observed by the staging write job
        # itself (CollectMetrics rides the one scan; Catalyst does not push
        # the drop_event filters below it), instead of a separate
        # groupBy(PID).count() job that re-read the whole source — at 100 TB
        # that pre-count was 2x read amplification on the production path.
        # Granularity: events_routed stays per-(partition, sink) because the
        # written files carry PID_COL and the re-aggregation below reads only
        # that columnar slice of what LANDED; events_in/events_dropped are
        # per-run (partition_id = -1). Attributing *dropped* rows to input
        # partitions is the one thing that inherently needs either a second
        # scan or persisting dropped rows — neither is acceptable by default;
        # post-hoc audit is still possible via the persisted _pid column.
        obs = Observation()
        df = df.observe(obs, F.count(F.lit(1)).alias("events_in"))

        routed = self.transform(df)
        # PySpark Observation captures only the FIRST action touching its
        # node. Stages with plan-time sampling (schema-less
        # decode_json_fields, timestamp sample validation) run a
        # limit(1)-style collect DURING transform() — on the observed
        # lineage — which would freeze events_in at the sample job's
        # partial count. Detect consumption (non-blocking probe) and fall
        # back to an explicit count job: only configs with sampling
        # stages pay the second scan.
        try:
            # getRowOrEmpty returns a scala Option (py4j does NOT map its
            # None$ to Python None — probe .isEmpty(), not `is None`)
            obs_consumed = not obs._jo.getRowOrEmpty().isEmpty()
        except Exception:
            obs_consumed = True  # can't prove it's clean → pay the scan
        payload_cols = [c for c in routed.columns if not c.startswith(META_PREFIX)]
        routed = routed.select(*payload_cols)
        if self.config.cluster_by:
            # lead with the partition column: FileFormatWriter requires rows
            # grouped by partition value and would otherwise inject its own
            # (non-stable) sort on _sink, scrambling the clustering
            routed = routed.sortWithinPartitions(SINK_COL, *self.config.cluster_by)

        # single-pass fan-out: one partitioned write, then per-sink adoption.
        # The staging path is run_id-scoped, so a leftover dir can only be
        # debris from a crashed/retried attempt of THIS run (e.g. a streaming
        # replay of the same checkpointed batch) — clear it instead of failing
        # the retry forever with path-exists.
        staging = os.path.join(cat.warehouse, f"_staging_{run_id}")
        shutil.rmtree(staging, ignore_errors=True)
        routed.write.partitionBy(SINK_COL).mode("errorifexists").parquet(staging)

        # explicit schema: an all-rows-dropped run leaves only _SUCCESS in
        # staging and schema inference would throw; with the known schema the
        # read is simply empty and the run still commits metrics + lineage
        written = self.spark.read.schema(routed.schema).parquet(staging)
        out_rows = (
            written.groupBy(SINK_COL, PID_COL)
            .agg(F.count("*").alias("cnt"))
            .collect()
        )
        sink_counts: dict[str, int] = {}
        metrics_rows: list[tuple] = []
        for r in out_rows:
            s, p, c = r[SINK_COL], r[PID_COL], r["cnt"]
            sink_counts[s] = sink_counts.get(s, 0) + c
            metrics_rows.append((run_id, int(p) if p is not None else -1, s, 0, 0, c))
        # the staging write has run, so the observed metric is available now
        events_in = (int(df.count()) if obs_consumed
                     else int(obs.get["events_in"]))
        events_routed_total = sum(sink_counts.values())
        metrics_rows.append(
            (run_id, -1, None, events_in, events_in - events_routed_total, 0)
        )

        for sink in sorted(sink_counts):
            cat.adopt_directory(
                os.path.join(staging, f"{SINK_COL}={escape_path_name(sink)}"),
                sink, run_id=run_id,
            )
        # leftover staging dir (only _SUCCESS marker remains) is removed
        shutil.rmtree(staging, ignore_errors=True)

        metrics_df = self.spark.createDataFrame(
            metrics_rows,
            "run_id string, partition_id int, sink string, "
            "events_in long, events_dropped long, events_routed long",
        )
        cat.append(metrics_df, METRICS_TABLE, run_id=run_id)

        # lineage is committed for EVERY run (a direct run(df) gets one row
        # with a NULL snapshot_id): the lineage commit is the run's "completed"
        # marker, so incomplete_runs()/rollback would otherwise misclassify
        # every direct run as crashed and delete validly committed sink data
        snaps = source_snapshots or []
        lineage_df = self.spark.createDataFrame(
            [(run_id, source_table, s, float(time.time())) for s in snaps]
            or [(run_id, source_table, None, float(time.time()))],
            "run_id string, source_table string, snapshot_id string, "
            "committed_at double",
        )
        cat.append(lineage_df, LINEAGE_TABLE, run_id=run_id)

        return RunResult(
            run_id=run_id,
            sinks=sink_counts,
            events_in=events_in,
            events_dropped=events_in - events_routed_total,
            snapshot_ids=snaps,
        )

    def run_incremental(self, source_table: str = "transcripts",
                        run_id: str | None = None) -> RunResult:
        """Resume from checkpoint: process only source snapshots not yet in
        the lineage table (registrar semantics). Idempotent: a second call
        with no new source snapshots is a no-op.

        SINGLE-DRIVER contract (same as the reference registrar's file
        lock): exactly one driver — batch OR streaming — may operate a
        warehouse at a time. The crash recovery below cannot distinguish a
        crashed run from a concurrent IN-FLIGHT one (a run between its
        sink commit and its lineage commit looks identical), so a
        concurrent driver's half-committed run would be rolled back and
        its rows lost when it commits lineage anyway."""
        cat = self.catalog
        assert cat is not None
        # recovery BEFORE resume: a previous run that crashed between sink
        # adoption and its lineage commit left orphan sink snapshots; its
        # source snapshots are still unprocessed per lineage, so resuming
        # without rollback would append their rows a second time
        for dead in sorted(cat.incomplete_runs(LINEAGE_TABLE)):
            cat.rollback_run(dead)
        done: set[str] = set()
        if cat.exists(LINEAGE_TABLE):
            done = {
                r["snapshot_id"]
                for r in cat.read(LINEAGE_TABLE)
                .filter(F.col("source_table") == source_table)
                .select("snapshot_id").distinct().collect()
            }
        todo = [s for s in cat.snapshots(source_table) if s.snapshot_id not in done]
        if not todo:
            return RunResult(run_id=run_id or "noop", sinks={}, events_in=0,
                             events_dropped=0, snapshot_ids=[], skipped=True)
        df = cat.read(source_table, [s.snapshot_id for s in todo])
        return self.run(df, run_id=run_id,
                        source_snapshots=[s.snapshot_id for s in todo],
                        source_table=source_table)


# -- the FIXTURES.md §5 reference pipeline (the e2e "query") ----------------

def fixture_config() -> PipelineConfig:
    """The golden end-to-end config: exercises dissect, drop_event-when,
    add_fields, rename, fingerprint, if/then tagging, selector routing."""
    return PipelineConfig(
        processors=[
            {"dissect": {
                "tokenizer": 'level=%{level} caller=%{caller} msg="%{msg}" '
                             'latency_ms=%{latency|integer}',
                "field": "text", "target_prefix": "parsed",
                "ignore_failure": True,
            }},
            {"drop_event": {"when": {"equals": {"role": "system"}}}},
            {"add_fields": {"target": "meta2",
                            "fields": {"pipeline_version": "1"}}},
            {"rename": {"fields": [{"from": "parsed.caller",
                                    "to": "parsed.origin"}],
                        "ignore_missing": True}},
            {"fingerprint": {"fields": ["conv_id", "turn_idx", "text"],
                             "method": "sha256",
                             "target_field": "fingerprint"}},
            {"if": {"range": {"parsed.latency": {"gte": 100}}},
             "then": [{"add_tags": {"tags": ["slow"]}}]},
        ],
        routes=[
            # mappings rewrite the *formatted* value (select.go:227-243), so
            # the rule formats the bare tool and maps it to a sink table name;
            # a mapping miss (unknown tool) falls to the default.
            {"sink": "%{[tool]}",
             "mappings": {"search": "sink_search", "code": "sink_code",
                          "browser": "sink_browser", "none": "sink_other"},
             "default": "sink_other",
             "when": {"has_fields": ["tool"]}},
        ],
    )
