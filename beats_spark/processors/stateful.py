"""Stateful operators re-expressed as window/group algebra: multiline
(event merging / sessionization) and rate_limit (token bucket → windowed
top-N). These are the two places the reference keeps cross-event state
(libbeat/reader/multiline, libbeat/processors/ratelimit); in Spark both
become shuffles on an explicit key — partitioning is the state.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, Window, functions as F

from beats_spark.event import get_path
from beats_spark.processors.base import Stage, register


@register("multiline")
def multiline(cfg: dict[str, Any]) -> Stage:
    """Merge consecutive rows into one event (libbeat/reader/multiline:
    pattern.go — ``pattern`` + ``negate`` + ``match: after|before``;
    counter.go — ``count_lines``; ``max_lines`` cap).

    Config: ``field`` (text), ``partition_by`` (e.g. [conv_id]),
    ``order_by`` (e.g. [turn_idx]), ``pattern``, ``negate``, ``match``,
    ``count_lines``, ``max_lines``, ``separator`` (default "\\n").

    Implementation: a start-of-group flag, a running ``sum`` over an ordered
    window → group id, then one groupBy concatenating lines in order. First
    row of each group keeps all other columns (reference keeps the first
    event's fields and appends content).
    """
    fld = cfg.get("field", "text")
    part = cfg.get("partition_by", ["conv_id"])
    order = cfg.get("order_by", ["turn_idx"])
    pattern = cfg.get("pattern")
    negate = bool(cfg.get("negate", False))
    match = cfg.get("match", "after")
    count_lines = cfg.get("count_lines")
    max_lines = cfg.get("max_lines")
    sep = cfg.get("separator", "\n")

    class Multiline(Stage):
        def custom(self, df: DataFrame) -> DataFrame:
            w = Window.partitionBy(*part).orderBy(*order)
            line = get_path(df, fld).cast("string")
            if count_lines:
                rn = F.row_number().over(w) - F.lit(1)
                start = (rn % F.lit(int(count_lines))) == 0
            else:
                hit = line.rlike(pattern)
                if negate:
                    hit = ~hit
                if match == "after":
                    # a NON-matching line starts a new event; matching lines
                    # glue to the previous one (pattern.go "after" mode)
                    start = ~hit
                else:  # "before": a matching line glues to the NEXT line
                    prev_hit = F.lag(hit, 1, False).over(w)
                    start = ~F.coalesce(prev_hit, F.lit(False))
                start = F.coalesce(start, F.lit(True))
                first = F.row_number().over(w) == 1
                start = start | first
            df = df.withColumn("__ml_start", start.cast("int"))
            df = df.withColumn("__ml_gid", F.sum("__ml_start").over(w))
            order_cols = [F.col(c) for c in order]
            pair = F.struct(*order_cols, line.alias("__line"))
            gb = df.groupBy(*part, "__ml_gid")
            keep_struct = F.struct(
                *[F.col(c) for c in df.columns if c not in part and not c.startswith("__ml")]
            )
            aggs = [
                F.min_by(keep_struct, F.struct(*order_cols)).alias("__first"),
                F.array_sort(F.collect_list(pair)).alias("__lines"),
            ]
            out = gb.agg(*aggs)
            lines = F.col("__lines")
            if max_lines:
                lines = F.slice(lines, 1, int(max_lines))
            merged = F.array_join(F.transform(lines, lambda s: s["__line"]), sep)
            keep = [c for c in df.columns if c not in part and not c.startswith("__ml")]
            cols = [F.col(p) for p in part] + [
                (merged if c == fld else F.col(f"__first.{c}")).alias(c) for c in keep
            ]
            return out.select(*cols).withColumn(
                "__n", F.lit(None)
            ).drop("__n")

    return Multiline()


@register("rate_limit")
def rate_limit(cfg: dict[str, Any]) -> Stage:
    """Token-bucket drop above ``limit`` "N/unit", optionally keyed by
    ``fields`` (ratelimit/rate_limit.go:102, token_bucket.go:64-74).

    Batch semantics: within each (key, time-window) allow the first N events
    in event-time order, drop the rest — ``row_number() over (partition by
    key, window(ts, unit)) <= N``. At 100 TB this is one shuffle on
    (key, window); AQE handles skewed keys.
    """
    limit = cfg.get("limit", "10000/m")
    fields = cfg.get("fields", [])
    ts_field = cfg.get("ts_field", "ts")
    n_s, unit = str(limit).split("/")
    n = int(n_s)
    window_dur = {"s": "1 second", "m": "1 minute", "h": "1 hour"}[unit]

    class RateLimit(Stage):
        def custom(self, df: DataFrame) -> DataFrame:
            ts = get_path(df, ts_field)
            win = F.window(ts, window_dur)["start"]
            keys = [get_path(df, f) for f in fields] + [win]
            w = Window.partitionBy(*keys).orderBy(ts)
            df = df.withColumn("__rl_rn", F.row_number().over(w))
            return df.filter(F.col("__rl_rn") <= n).drop("__rl_rn")

    return RateLimit()
