"""Streaming runner: the same Pipeline plan over a streaming source.

Design: ``foreachBatch`` — each micro-batch goes through the IDENTICAL
batch fan-out path (``Pipeline.run`` with the batch id as run id), so sink
tables, metrics and lineage are one code path for batch and streaming, and
exactly-once lands on the catalog's commit atomicity + Spark's checkpointed
batch ids (a replayed batch reuses its run_id → the lineage table makes the
re-append detectable/idempotent). This mirrors the reference's publisher:
the queue hands batches to one output path regardless of input
(libbeat/publisher/pipeline/consumer.go:70).

Event-time extras for late data (not needed by the batch contract but
provided): ``windowed_counts`` — watermarked tumbling-window counts per
sink, the streaming analogue of the pipeline_metrics table; and
``dedup_stream`` — watermarked dropDuplicates on the fingerprint column
(the ES ``_id`` dedup the reference gets from its sink).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery


def run_stream(pipe, source: DataFrame, checkpoint: str,
               trigger_seconds: int | None = None) -> StreamingQuery:
    """source (readStream DF) → micro-batch fan-out via the batch pipeline."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        run_id = f"stream-{batch_id:08d}"
        # idempotent replay: if this batch id already committed, skip
        cat = pipe.catalog
        from beats_spark.pipeline import LINEAGE_TABLE

        if cat.exists(LINEAGE_TABLE):
            seen = (
                cat.read(LINEAGE_TABLE)
                .filter(F.col("run_id") == run_id)
                .limit(1).count()
            )
            if seen:
                return
        # a PARTIALLY committed earlier attempt (crashed between sink
        # adoption and the lineage commit) would double-append on replay;
        # rollback_run removes its snapshots + staging debris and is a
        # no-op for an unknown run_id — so the replay is exactly-once
        cat.rollback_run(run_id)
        pipe.run(batch_df, run_id=run_id,
                 source_snapshots=[run_id], source_table="_stream")

    w = source.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint
    )
    if trigger_seconds:
        w = w.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        w = w.trigger(availableNow=True)
    return w.start()


def windowed_counts(routed: DataFrame, window: str = "1 minute",
                    watermark: str = "2 minutes") -> DataFrame:
    """Streaming per-sink counts with late-data handling: watermarked
    tumbling windows (the events_routed metric as a live stream)."""
    return (
        routed.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("_sink"))
        .agg(F.count("*").alias("events_routed"))
        .select(F.col("w.start").alias("window_start"), "_sink", "events_routed")
    )


def dedup_stream(df: DataFrame, fingerprint_col: str = "fingerprint",
                 watermark: str = "10 minutes") -> DataFrame:
    """At-least-once → effectively-once: watermarked dropDuplicates on the
    content fingerprint (the dedup ES gives the reference via ``_id``)."""
    return df.withWatermark("ts", watermark).dropDuplicates([fingerprint_col, "ts"])
