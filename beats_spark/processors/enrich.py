"""Lookup enrichment = broadcast hash join.

All of the reference's enrichers (dns caches, add_docker/kubernetes/
process_metadata, translate_sid — SURVEY §2.6) are hash-map lookups against
a cached side table: semantically a LEFT OUTER BROADCAST JOIN of the event
stream against a small dimension. Never per-row IO; at 100 TB the dim ships
once per executor and the join is map-side (no shuffle of the big side).
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column, DataFrame, functions as F

from beats_spark.event import get_path, has_path
from beats_spark.processors.base import Stage, register

# name → DataFrame provider, bound by the pipeline before building stages
_LOOKUP_PROVIDERS: dict[str, Callable[[], DataFrame]] = {}


def register_lookup(name: str, provider: Callable[[], DataFrame]) -> None:
    _LOOKUP_PROVIDERS[name] = provider


@register("enrich")
def enrich(cfg: dict[str, Any]) -> Stage:
    """Config: ``lookup`` (registered name) or ``table`` (parquet path),
    ``on`` (event field = dim key column), ``fields`` (dim columns to bring,
    optional rename map), ``target`` (prefix, default the lookup name),
    ``default`` (value map applied on miss — the left-join-null path).
    """
    lookup_name = cfg.get("lookup")
    table_path = cfg.get("table")
    on = cfg["on"]
    key_col = cfg.get("key", on.split(".")[-1])
    fields = cfg.get("fields")  # None = all non-key columns
    target = cfg.get("target", lookup_name or "enrich")
    defaults = cfg.get("default", {})

    class Enrich(Stage):
        def custom(self, df: DataFrame) -> DataFrame:
            spark = df.sparkSession
            if lookup_name is not None:
                dim = _LOOKUP_PROVIDERS[lookup_name]()
            elif table_path is not None:
                dim = spark.read.parquet(table_path)
            else:
                raise ValueError("enrich: lookup or table required")
            cols = fields or [c for c in dim.columns if c != key_col]
            if isinstance(cols, dict):
                pairs = list(cols.items())
            else:
                pairs = [(c, c) for c in cols]
            # dim columns ride the join under a reserved prefix so a dim
            # column sharing a name with an event column can neither
            # become an ambiguous reference nor get the event's own
            # column dropped afterwards
            sel = [F.col(src).alias(f"__enr_{dst}") for src, dst in pairs]
            out_names = [dst for _, dst in pairs]
            dim = dim.select(F.col(key_col).alias("__enrich_key"), *sel)
            joined = df.join(
                F.broadcast(dim),
                get_path(df, on) == F.col("__enrich_key"),
                "left",
            ).drop("__enrich_key")
            payload_cols: list[Column] = []
            for c in out_names:
                v = F.col(f"__enr_{c}")
                if c in defaults:
                    v = F.coalesce(v, F.lit(defaults[c]))
                payload_cols.append(v.alias(c))
            payload = F.struct(*payload_cols)
            from beats_spark.event import with_path
            joined = with_path(joined, target, payload)
            return joined.drop(*[f"__enr_{c}" for c in out_names])

    return Enrich()


@register("add_network_direction")
def add_network_direction(cfg: dict[str, Any]) -> Stage:
    """Classify src/dst IPs vs internal_networks → direction
    (actions/add_network_direction.go:34-53)."""
    from beats_spark.conditions import NAMED_NETWORKS, _cidr_match

    src_f = cfg.get("source", "source.ip")
    dst_f = cfg.get("destination", "destination.ip")
    target = cfg.get("target", "network.direction")
    networks = cfg.get("internal_networks", ["private"])

    def is_internal(col: Column) -> Column:
        out = F.lit(False)
        for n in networks:
            for cidr in NAMED_NETWORKS.get(n, [n]):
                out = out | _cidr_match(col.cast("string"), cidr)
        return F.coalesce(out, F.lit(False))

    class NetDir(Stage):
        def updates(self, df: DataFrame) -> dict[str, Column]:
            if not (has_path(df.schema, src_f) and has_path(df.schema, dst_f)):
                return {}
            s_in = is_internal(get_path(df, src_f))
            d_in = is_internal(get_path(df, dst_f))
            direction = (
                F.when(s_in & d_in, "internal")
                .when(s_in & ~d_in, "outbound")
                .when(~s_in & d_in, "inbound")
                .otherwise("external")
            )
            return {target: direction}

    return NetDir()
