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


def _mask_hex_const(hexcol: Column, plen: int) -> Column:
    """First ``plen`` bits of a hex-encoded address, as the hex prefix
    string: whole nibbles verbatim + the next nibble masked. ``plen`` is a
    plan-time constant here (event side: one expression per distinct dim
    prefix length), so this folds to a substring + tiny arithmetic."""
    nib, rem = plen // 4, plen % 4
    body = F.substring(hexcol, 1, nib) if nib else F.lit("")
    if rem:
        step = 16 >> rem
        nibble = F.conv(F.substring(hexcol, nib + 1, 1), 16, 10).cast("int")
        body = F.concat(body, F.conv(nibble - nibble % step, 10, 16))
    return body


def _mask_hex_col(hexcol: Column, plen: Column) -> Column:
    """Same masking with a per-row prefix length (dim side)."""
    nib = F.floor(plen / 4).cast("int")
    rem = (plen % 4).cast("int")
    step = (F.when(rem == 1, 8).when(rem == 2, 4)
            .when(rem == 3, 2).otherwise(16)).cast("int")
    nibble = F.conv(hexcol.substr(nib + 1, F.lit(1)), 16, 10).cast("int")
    body = hexcol.substr(F.lit(1), nib)
    return F.when(rem == 0, body).otherwise(
        F.concat(body, F.conv(nibble - nibble % step, 10, 16)))


@register("enrich_cidr")
def enrich_cidr(cfg: dict[str, Any]) -> Stage:
    """Longest-prefix CIDR-range enrich — the geoip join shape
    (filebeat/module/nginx/access/ingest/pipeline.yml:126-133 consumes it;
    the MaxMind DB itself cannot ship, the *join* is what the pipeline
    needs). An ip column matches the most specific CIDR row of a broadcast
    dim table.

    Config: ``lookup``/``table`` (dim with a ``cidr`` column + payload
    columns), ``on`` (event ip field), ``cidr`` (dim column, default
    "cidr"), ``fields`` (list or rename map, default all non-cidr),
    ``target`` (default the lookup name), ``ignore_missing``.

    Shape: each dim CIDR becomes (family, prefix_len, masked-hex-key); the
    event ip is hex-encoded ONCE, then for each distinct prefix length in
    the dim (collected at plan time — the dim is small by contract, like
    the PSL table in registered_domain) the event computes its constant-
    length masked key and LEFT BROADCAST-joins that length's slice of the
    dim, longest first; the payload is the first non-null match. All
    map-side: at 100 TB this is ≤ address-bits broadcast hash joins and
    ZERO shuffles of the event stream — no explode amplification, no
    groupBy to pick the longest match. IPv4 and IPv6 dims can coexist
    (keys are family-tagged). Duplicate dim rows at the same (family,
    prefix, key) keep the first (dropDuplicates), matching hash-lookup
    first-wins."""
    lookup_name = cfg.get("lookup")
    table_path = cfg.get("table")
    on = cfg["on"]
    cidr_col = cfg.get("cidr", "cidr")
    fields = cfg.get("fields")
    target = cfg.get("target", lookup_name or "enrich_cidr")
    ignore_missing = cfg.get("ignore_missing", False)
    unknown = set(cfg) - {"lookup", "table", "on", "cidr", "fields",
                          "target", "ignore_missing", "when"}
    if unknown:
        raise ValueError(f"enrich_cidr: unknown config keys {sorted(unknown)}")

    class EnrichCIDR(Stage):
        def custom(self, df: DataFrame) -> DataFrame:
            from beats_spark.event import with_path
            from beats_spark.processors.flowhash import _ip_bytes

            if not has_path(df.schema, on):
                if ignore_missing:
                    return df
                raise ValueError(f"enrich_cidr: missing field {on!r}")
            spark = df.sparkSession
            if lookup_name is not None:
                dim = _LOOKUP_PROVIDERS[lookup_name]()
            elif table_path is not None:
                dim = spark.read.parquet(table_path)
            else:
                raise ValueError("enrich_cidr: lookup or table required")
            cols = fields or [c for c in dim.columns if c != cidr_col]
            pairs = (list(cols.items()) if isinstance(cols, dict)
                     else [(c, c) for c in cols])

            # F.get (not []) — a bare address row has no '/' and ANSI mode
            # turns the missing index into a hard error.
            # Stage the hex behind a projection boundary FIRST: the IPv6
            # parse inside _ip_bytes is a large expression tree, and the
            # masking/family/length expressions below reference it several
            # times — inlined, the dim plan balloons to tens of MiB (same
            # staging discipline as flowhash.py's __cid_* columns).
            ip_part = F.get(F.split(F.col(cidr_col), "/"), 0)
            dim = dim.withColumn("__hex", F.hex(_ip_bytes(ip_part)))
            dim_hex = F.col("__hex")
            fam = F.when(F.length(dim_hex) == 8, "4").otherwise("6")
            bits = F.when(fam == "4", 32).otherwise(128)
            plen = F.coalesce(
                F.get(F.split(F.col(cidr_col), "/"), 1).try_cast("int"), bits)
            dim = dim.select(
                fam.alias("__fam"), plen.alias("__plen"),
                _mask_hex_col(dim_hex, plen).alias("__key"),
                F.struct(*[F.col(s).alias(d) for s, d in pairs])
                .alias("__payload"),
            ).where(F.col("__key").isNotNull() & (F.col("__plen") >= 0)
                    & (F.col("__plen") <= bits))
            # dedup ONCE (first-wins like a hash lookup) and cut lineage:
            # each per-length broadcast build below would otherwise re-run
            # the whole parse+dedup subtree, one dim-side shuffle per slice
            dim = (dim.dropDuplicates(["__fam", "__plen", "__key"])
                   .localCheckpoint())
            # distinct (family, prefix_len): tiny plan-time job on the
            # broadcast-sized dim (same contract as the PSL collect in
            # registered_domain)
            lengths = sorted(
                ((r["__fam"], r["__plen"])
                 for r in dim.select("__fam", "__plen").distinct().collect()),
                key=lambda t: -t[1])

            ip = get_path(df, on).cast("string")
            existing = {c.lower() for c in df.columns}
            tp, i = "__cidr_", 0
            while any(f"{tp}{x}".lower() in existing
                      for x in ["hex", *range(len(lengths))]):
                i += 1
                tp = f"__cidr{i}_"
            df = df.withColumn(tp + "hex", F.hex(_ip_bytes(ip)))
            ev_hex = F.col(tp + "hex")
            ev_fam = F.when(F.length(ev_hex) == 8, "4").otherwise("6")

            hits: list[Column] = []
            for idx, (f_, l_) in enumerate(lengths):
                slice_ = (dim.where((F.col("__fam") == f_)
                                    & (F.col("__plen") == l_))
                          .select(F.col("__key").alias(f"{tp}k{idx}"),
                                  F.col("__payload").alias(f"{tp}p{idx}")))
                ev_key = F.when(ev_fam == f_, _mask_hex_const(ev_hex, l_))
                df = df.join(F.broadcast(slice_),
                             ev_key == F.col(f"{tp}k{idx}"), "left")
                hits.append(F.col(f"{tp}p{idx}"))
            payload = F.coalesce(*hits) if hits else F.lit(None)
            out = with_path(df, target, payload)
            return out.drop(tp + "hex",
                            *[f"{tp}k{i}" for i in range(len(lengths))],
                            *[f"{tp}p{i}" for i in range(len(lengths))])

    return EnrichCIDR()


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
