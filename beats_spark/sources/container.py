"""Container log reader: Docker json-file and CRI formats, partial-line
joining, stream filtering — libbeat/reader/readjson/docker_json.go
re-expressed as window/group algebra.

Reference behavior (docker_json.go):
- docker json-file lines: ``{"log":"...\\n","stream":"stdout","time":...}``;
  a chunk whose log does NOT end in a newline is PARTIAL (docker splits
  output at 16K) and is joined with following chunks until a full one
  (parseDockerJSONLog:203, Next():236-254 append loop).
- CRI lines: ``<rfc3339nano-ts> <stream> <P|F> <content>`` — the P tag marks
  a partial line (parseCRILog:147-166).
- ``format: auto`` dispatches per line on a leading ``{`` (parseAuto:206).
- stream filter ``all|stdout|stderr`` applies to the (joined) event.
- unparsable lines are logged and skipped (Next():232).

Spark mapping: one text scan → per-line parse (from_json / split, pure JVM
columns) → partial runs merged with the same start-flag/running-sum group
trick as multiline (a row starts an event unless the PREVIOUS row was
partial) → stream filter. The only shuffle is the per-file window, bounded
per file exactly like the reference's serial per-file reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

_DOCKER_SCHEMA = "log string, stream string, time string, attrs map<string,string>"


def read_container_logs(
    spark: SparkSession,
    paths: str | list[str],
    *,
    glob: str | None = None,
    stream: str = "all",
    format: str = "auto",          # auto | docker | cri
    cri_flags: bool = True,
    combine_partials: bool = True,
) -> DataFrame:
    """Read container log files into
    ``message, stream, ts, log struct<file:struct<path>, offset>``."""
    if stream not in ("all", "stdout", "stderr"):
        raise ValueError(f"stream must be all|stdout|stderr, got {stream!r}")
    if format not in ("auto", "docker", "cri"):
        raise ValueError(f"format must be auto|docker|cri, got {format!r}")
    if isinstance(paths, str):
        paths = [paths]
    reader = spark.read
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.text(paths).select(
        F.col("value"), F.input_file_name().alias("__path")
    )
    w = Window.partitionBy("__path").orderBy(F.monotonically_increasing_id())
    df = df.withColumn("__offset", F.row_number().over(w).cast("long") - 1)

    # -- per-line parse (JVM columns only) ----------------------------------
    j = F.from_json(F.col("value"), _DOCKER_SCHEMA)
    docker_ok = (j["log"].isNotNull()
                 & F.try_to_timestamp(j["time"]).isNotNull())
    docker_partial = (j["log"] == "") | ~j["log"].endswith("\n")

    n_head = 3 if cri_flags else 2  # fields before content: ts stream [tags]
    cri = F.split(F.col("value"), " ", n_head + 1)
    cri_ts = F.try_to_timestamp(cri[0])
    cri_stream = cri[1]
    cri_ok = (
        (F.size(cri) == n_head + 1)
        & cri_ts.isNotNull()
        & cri_stream.isin("stdout", "stderr")
    )
    cri_partial = (
        F.array_contains(F.split(cri[2], ":"), "P") if cri_flags else F.lit(False)
    )
    cri_content = cri[n_head]

    if format == "docker":
        is_docker = F.lit(True)
    elif format == "cri":
        is_docker = F.lit(False)
    else:  # auto: a leading '{' means docker json-file (parseAuto:206)
        is_docker = F.col("value").startswith("{")

    parsed = df.select(
        "__path", "__offset",
        F.when(is_docker, j["log"]).otherwise(cri_content).alias("__content"),
        F.when(is_docker, j["stream"]).otherwise(cri_stream).alias("stream"),
        F.when(is_docker, F.try_to_timestamp(j["time"])).otherwise(cri_ts).alias("ts"),
        F.when(is_docker, docker_partial).otherwise(cri_partial).alias("__partial"),
        F.when(is_docker, docker_ok).otherwise(cri_ok).alias("__ok"),
    ).filter(F.col("__ok"))  # unparsable lines are skipped, like Next():232

    # -- join partial runs ---------------------------------------------------
    if combine_partials:
        wp = Window.partitionBy("__path").orderBy("__offset")
        prev_partial = F.coalesce(
            F.lag("__partial", 1, False).over(wp), F.lit(False)
        )
        parsed = parsed.withColumn("__start", (~prev_partial).cast("int"))
        parsed = parsed.withColumn("__gid", F.sum("__start").over(wp))
        pair = F.struct(F.col("__offset"), F.col("__content").alias("c"))
        merged = (
            parsed.groupBy("__path", "__gid")
            .agg(
                F.min("__offset").alias("__offset"),
                F.min_by("stream", "__offset").alias("stream"),
                F.min_by("ts", "__offset").alias("ts"),
                F.array_sort(F.collect_list(pair)).alias("__chunks"),
            )
            .withColumn(
                "__content",
                F.array_join(F.transform("__chunks", lambda s: s["c"]), ""),
            )
            .drop("__chunks", "__gid")
        )
    else:
        merged = parsed.drop("__partial", "__ok", )

    if stream != "all":
        merged = merged.filter(F.col("stream") == stream)

    # docker log payloads carry the trailing newline; strip it like the
    # strip_newline reader stage that follows in the harvester chain
    message = F.regexp_replace(F.col("__content"), r"\n$", "")
    return merged.select(
        message.alias("message"),
        "stream",
        "ts",
        F.struct(
            F.struct(F.col("__path").alias("path")).alias("file"),
            F.col("__offset").alias("offset"),
        ).alias("log"),
    )
