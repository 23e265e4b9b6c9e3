"""spark-submit entry point.

Production invocation (the north rule's deployment shape)::

    python -m beats_spark.cli package --out /tmp/beats_spark.zip
    spark-submit --py-files /tmp/beats_spark.zip \
        --master ... --num-executors N \
        -m beats_spark.cli run --config pipeline.json --warehouse s3://... \
        --source-table transcripts

Subcommands:
- ``package``: zip the library for --py-files.
- ``ingest``:  append a parquet directory as a new source-table snapshot.
- ``run``:     incremental pipeline run (resume from lineage checkpoint);
               prints a JSON run report (run_id, per-sink counts, snapshots).
- ``stream``:  the Structured Streaming variant (micro-batch fan-out via
               foreachBatch; see beats_spark/streaming).

The config file is the YAML-shaped dict of PipelineConfig.from_dict, as
JSON (no yaml dependency in this sandbox)::

    {"processors": [...], "output": {"routes": [...]},
     "salt_column": "conv_id", "salt_buckets": 8}
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile


def _spark(args):
    from beats_spark.session import get_spark

    return get_spark("beats_spark", master=args.master or None)


def cmd_package(args) -> None:
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    base = args.out[:-4] if args.out.endswith(".zip") else args.out
    path = shutil.make_archive(base, "zip", os.path.dirname(pkg_dir), "beats_spark")
    print(path)


def cmd_ingest(args) -> None:
    from beats_spark.catalog import ParquetCatalog

    spark = _spark(args)
    cat = ParquetCatalog(spark, args.warehouse)
    df = spark.read.parquet(args.input)
    missing = [c for c in ("conv_id", "turn_idx", "role", "text", "tool", "ts")
               if c not in df.columns]
    if missing:
        raise SystemExit(
            f"ingest: input is not transcript-shaped, missing columns "
            f"{missing} (have: {df.columns}). Derive transcripts first "
            "(beats_spark.testdata.transcripts_from_events for the events "
            "table) or pass a conforming parquet."
        )
    snap = cat.append(df, args.source_table)
    print(json.dumps({"table": args.source_table,
                      "snapshot_id": snap.snapshot_id,
                      "rows": df.count()}))


def cmd_run(args) -> None:
    from beats_spark.catalog import ParquetCatalog
    from beats_spark.pipeline import Pipeline, PipelineConfig, fixture_config

    spark = _spark(args)
    if args.config:
        with open(args.config) as f:
            cfg = PipelineConfig.from_dict(json.load(f))
    else:
        cfg = fixture_config()
    cat = ParquetCatalog(spark, args.warehouse)
    pipe = Pipeline(spark, cfg, cat)
    res = pipe.run_incremental(args.source_table, run_id=args.run_id)
    print(json.dumps({
        "run_id": res.run_id, "skipped": res.skipped,
        "events_in": res.events_in, "events_dropped": res.events_dropped,
        "sinks": res.sinks, "source_snapshots": res.snapshot_ids,
    }))


def cmd_stream(args) -> None:
    from beats_spark.catalog import ParquetCatalog
    from beats_spark.pipeline import Pipeline, PipelineConfig, fixture_config
    from beats_spark.streaming.runner import run_stream

    spark = _spark(args)
    if args.config:
        with open(args.config) as f:
            cfg = PipelineConfig.from_dict(json.load(f))
    else:
        cfg = fixture_config()
    cat = ParquetCatalog(spark, args.warehouse)
    pipe = Pipeline(spark, cfg, cat)
    src = spark.readStream.schema(args.stream_schema).parquet(args.input)
    q = run_stream(pipe, src, checkpoint=args.checkpoint
                   or tempfile.mkdtemp(prefix="bs_ckpt_"))
    q.awaitTermination(args.timeout or None)


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="beats_spark")
    p.add_argument("--master", default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("package")
    sp.add_argument("--out", default="beats_spark.zip")
    sp.set_defaults(fn=cmd_package)

    si = sub.add_parser("ingest")
    si.add_argument("--input", required=True)
    si.add_argument("--warehouse", required=True)
    si.add_argument("--source-table", default="transcripts")
    si.set_defaults(fn=cmd_ingest)

    sr = sub.add_parser("run")
    sr.add_argument("--config", default=None)
    sr.add_argument("--warehouse", required=True)
    sr.add_argument("--source-table", default="transcripts")
    sr.add_argument("--run-id", default=None)
    sr.set_defaults(fn=cmd_run)

    ss = sub.add_parser("stream")
    ss.add_argument("--config", default=None)
    ss.add_argument("--input", required=True)
    ss.add_argument("--warehouse", required=True)
    ss.add_argument("--checkpoint", default=None)
    ss.add_argument("--stream-schema",
                    default="conv_id string, turn_idx int, role string, "
                            "text string, tool string, ts timestamp")
    ss.add_argument("--timeout", type=int, default=None)
    ss.set_defaults(fn=cmd_stream)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
