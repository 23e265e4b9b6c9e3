"""Output codecs + simple sinks (SURVEY §2.4).

- json codec (outputs/codec/json/json.go:32-67): event → one JSON line;
  ``escape_html`` and ``pretty`` supported. JVM ``to_json`` — the pretty
  variant post-processes driver-side only for console display.
- format codec (outputs/codec/format/format.go:29-52): an event-format
  string rendered per row (fmtstr compiler → one concat expression).
- file output (outputs/fileout/file.go:115-126): NDJSON directory write;
  "rotation" maps to Spark's natural per-task files + ``maxRecordsPerFile``.
- console output (outputs/console/console.go:106): NDJSON to stdout
  (driver-side collect of a bounded sample — debugging only by design).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, functions as F

from beats_spark.fmtstr import compile_fmtstr
from beats_spark.schema import META_PREFIX


def payload_columns(df: DataFrame) -> list[str]:
    """Sink payload = everything except @metadata-style system columns
    (beat.Event.Meta is not indexed, libbeat/beat/event.go:113-126)."""
    return [c for c in df.columns
            if not c.startswith(META_PREFIX) and not c.startswith("_")]


def json_codec(df: DataFrame, escape_html: bool = False) -> Column:
    """One JSON document per row over the payload columns."""
    doc = F.to_json(F.struct(*[F.col(c) for c in payload_columns(df)]))
    if escape_html:
        for ch, esc in (("<", "\\u003c"), (">", "\\u003e"), ("&", "\\u0026")):
            doc = F.replace(doc, F.lit(ch), F.lit(esc))
    return doc


def format_codec(df: DataFrame, fmt: str) -> Column:
    """format codec: ``%{[field]}`` string per row."""
    return compile_fmtstr(df, fmt)


def write_file_ndjson(df: DataFrame, path: str, *,
                      codec: str = "json", fmt: str | None = None,
                      max_records_per_file: int | None = None,
                      escape_html: bool = False,
                      mode: str = "errorifexists") -> None:
    """The file output: NDJSON (or formatted-line) directory.

    ``max_records_per_file`` is the rotation analogue (``rotate_every_kb``/
    ``number_of_files`` bound file sizes; here Spark bounds records per
    part-file — same operational goal, no serial rename chain)."""
    if codec == "json":
        line = json_codec(df, escape_html=escape_html)
    elif codec == "format":
        if not fmt:
            raise ValueError("format codec needs fmt")
        line = format_codec(df, fmt)
    else:
        raise ValueError(f"unknown codec {codec!r}")
    out = df.select(line.alias("value"))
    w = out.write.mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", int(max_records_per_file))
    w.text(path)


def console_output(df: DataFrame, limit: int = 20, **codec_kwargs) -> list[str]:
    """Console sink: bounded NDJSON sample to the driver (debug path)."""
    lines = [r["v"] for r in
             df.select(json_codec(df, **codec_kwargs).alias("v")).limit(limit).collect()]
    for ln in lines:
        print(ln)
    return lines
