"""Input sources (SURVEY §2.1): the reference's input → harvester → reader
chain re-expressed as Spark reads.

- ``logfile``: filebeat's log input (filebeat/input/log/input.go:213,
  harvester.go:241) — glob paths, read lines, optional charset decode,
  NDJSON parse, include/exclude_lines, multiline merge. One Spark task per
  file split ≡ one harvester; ``log.file.path`` / ``log.offset`` columns
  reproduce the harvester's event envelope (harvester.go:413-477).
- ``table``: the primary transcript-table source (Iceberg in production,
  the parquet snapshot catalog here) with registrar-style incremental
  resume (filebeat/registrar) via the lineage table.
- ``container``: Docker json-file / CRI log formats with partial-line
  joining and stream filtering (libbeat/reader/readjson/docker_json.go).
- ``kafka``: config → spark Kafka reader options (untestable in this
  sandbox — construction covered by unit tests, IO gated).
"""

from beats_spark.sources.container import read_container_logs  # noqa: F401
from beats_spark.sources.logfile import read_log_files  # noqa: F401
from beats_spark.sources.kafka import kafka_reader_options  # noqa: F401
