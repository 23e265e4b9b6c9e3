"""Condition AST → Catalyst Column (the pipeline's WHERE language).

Mirrors libbeat/conditions: config keys ``equals, contains, regexp, range,
has_fields, network, or, and, not`` (conditions.go:30-40, dispatch :55-100).
Every construct is natively expressible in Spark SQL, so compiled conditions
participate in codegen and get pushed down into the scan by Catalyst —
something the reference (per-event Go interpreter) cannot do.

Semantics preserved:
- a missing field makes the leaf condition FALSE, never NULL/error
  (conditions fetch via GetValue and treat errors as no-match);
- ``equals`` supports scalar equality (equals.go:63-112, string/int/bool);
- ``contains`` is substring match, ``regexp`` is a regex search (un-anchored,
  Go regexp.MatchString semantics — conditions/matcher.go:39-84);
- ``range`` coerces numerics to double and ANDs the bounds
  (range.go:85-139);
- ``network`` matches IPv4 against CIDRs or named ranges (network.go:45-70).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, functions as F

from pyspark.sql import types as T

from beats_spark.event import get_path, has_path, path_type

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_NUMERIC = _INTEGRAL + (T.FloatType, T.DoubleType, T.DecimalType)

# named network ranges (libbeat/conditions/network.go:26-57: RFC 1918 +
# RFC 4193 private, Go net.IP named classes for both families)
NAMED_NETWORKS: dict[str, list[str]] = {
    "loopback": ["127.0.0.0/8", "::1/128"],
    "private": ["10.0.0.0/8", "172.16.0.0/12", "192.168.0.0/16", "fd00::/8"],
    "multicast": ["224.0.0.0/4", "ff00::/8"],
    "link_local_unicast": ["169.254.0.0/16", "fe80::/10"],
    "unspecified": ["0.0.0.0/32", "::/128"],
}

# octets bounded to 0-255: a permissive \d{1,3} would let '999.1.2.3'
# alias into a 34-bit value and positively match unrelated CIDRs, where
# Go's net.ParseIP rejects the address outright
_IPV4_OCTET = r"(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"
_IPV4_RE = rf"^{_IPV4_OCTET}\.{_IPV4_OCTET}\.{_IPV4_OCTET}\.{_IPV4_OCTET}$"
_IPV4_TAIL_RE = r":(\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3})$"


def _ip4_to_long(col: Column) -> Column:
    p = F.split(col, r"\.")
    return (
        p[0].try_cast("long") * F.lit(16777216)
        + p[1].try_cast("long") * F.lit(65536)
        + p[2].try_cast("long") * F.lit(256)
        + p[3].try_cast("long")
    )


def _cidr4_match(col: Column, cidr: str) -> Column:
    net, bits_s = cidr.split("/")
    bits = int(bits_s)
    parts = [int(x) for x in net.split(".")]
    net_long = (parts[0] << 24) + (parts[1] << 16) + (parts[2] << 8) + parts[3]
    mask = ((1 << 32) - 1) ^ ((1 << (32 - bits)) - 1) if bits < 32 else (1 << 32) - 1
    return col.rlike(_IPV4_RE) & (
        _ip4_to_long(col).bitwiseAND(F.lit(mask)) == F.lit(net_long & mask)
    )


def _ip6_words(col: Column) -> Column:
    """Parse an IPv6 literal into an array<long> of eight 16-bit words, or
    NULL when the string is not valid IPv6. Pure Catalyst expressions
    (split / filter / conv) — conditions stay pushdown-friendly JVM code,
    no UDF. Handles ``::`` zero-compression and the embedded-IPv4 tail
    (``::ffff:1.2.3.4``), like Go's net.ParseIP (network.go matching)."""
    s = F.lower(F.trim(col))
    # embedded dotted-quad tail -> two hex words
    v4 = F.regexp_extract(s, _IPV4_TAIL_RE, 1)
    v4l = _ip4_to_long(v4)
    s = F.when(v4 == "", s).otherwise(
        F.concat(
            F.regexp_replace(s, _IPV4_TAIL_RE, ":"),
            F.lower(F.conv(F.shiftright(v4l, 16).cast("string"), 10, 16)),
            F.lit(":"),
            F.lower(F.conv(v4l.bitwiseAND(F.lit(0xFFFF)).cast("string"), 10, 16)),
        )
    )
    # a single leading/trailing ':' (not part of '::') is invalid per
    # net.ParseIP (':1:2:3:4:5:6:7:8'), but the empty-group filter below
    # would otherwise silently accept it as 8 words
    shape_ok = (
        s.rlike(r"^[0-9a-f:]+$")
        & ~s.contains(":::")
        & (F.size(F.split(s, "::")) <= 2)
        & ~s.rlike(r"^:[^:]")
        & ~s.rlike(r"[^:]:$")
    )
    parts = F.split(s, "::")
    has_dc = F.size(parts) == 2
    grp = lambda seg: F.filter(  # noqa: E731
        F.split(seg, ":"), lambda x: x != ""
    )
    left = grp(F.element_at(parts, 1))
    right = F.when(has_dc, grp(F.element_at(parts, 2))).otherwise(
        F.array().cast("array<string>")
    )
    n = F.size(left) + F.size(right)
    full = F.when(
        has_dc & (n <= 7),
        F.concat(left, F.array_repeat(F.lit("0"), 8 - n), right),
    ).otherwise(F.when(~has_dc & (n == 8), left))
    groups_ok = F.forall(full, lambda g: g.rlike("^[0-9a-f]{1,4}$"))
    words = F.transform(full, lambda g: F.conv(g, 16, 10).cast("long"))
    return F.when(shape_ok & full.isNotNull() & groups_ok, words)


def _cidr6_match(col: Column, cidr: str) -> Column:
    import ipaddress

    net = ipaddress.ip_network(cidr, strict=False)
    packed = net.network_address.packed
    net_words = [int.from_bytes(packed[i:i + 2], "big") for i in range(0, 16, 2)]
    bits = net.prefixlen
    words = _ip6_words(col)
    cond = words.isNotNull()
    full_words, rem = divmod(bits, 16)
    for i in range(full_words):
        cond = cond & (F.element_at(words, i + 1) == F.lit(net_words[i]))
    if rem:
        shift = 16 - rem
        cond = cond & (
            F.shiftright(F.element_at(words, full_words + 1), shift)
            == F.lit(net_words[full_words] >> shift)
        )
    return F.coalesce(cond, F.lit(False))


def _cidr_match(col: Column, cidr: str) -> Column:
    if "/" not in cidr:
        cidr = cidr + ("/128" if ":" in cidr else "/32")
    if ":" in cidr:
        return _cidr6_match(col, cidr)
    return _cidr4_match(col, cidr)


def _false_if_null(c: Column) -> Column:
    """NULL→FALSE without breaking predicate pushdown: ``coalesce(p, false)``
    is opaque to the parquet filter translator, while ``isnotnull(col) AND p``
    pushes down — callers therefore pass null-guarded conjunctions where
    possible and only fall back to coalesce for complex leaves."""
    return F.coalesce(c, F.lit(False))


def _leaf_fields(df: DataFrame, mapping: dict[str, Any]):
    for field, arg in mapping.items():
        yield field, get_path(df, field), has_path(df.schema, field), arg


def compile_condition(df: DataFrame, cfg: dict[str, Any]) -> Column:
    """Compile a condition config dict against ``df``'s schema.

    Multiple keys inside one ``equals``/``contains``/... block AND together,
    matching the reference's NewCondition building one matcher per field.
    """
    if not isinstance(cfg, dict) or len(cfg) != 1:
        raise ValueError(f"condition must be a single-key dict, got: {cfg!r}")
    (kind, arg), = cfg.items()

    if kind == "and":
        out = F.lit(True)
        for sub in arg:
            out = out & compile_condition(df, sub)
        return out
    if kind == "or":
        out = F.lit(False)
        for sub in arg:
            out = out | compile_condition(df, sub)
        return out
    if kind == "not":
        # NULL from the inner condition must read as FALSE before negation
        # (reference: no-match → false → not → true)
        return ~_false_if_null(compile_condition(df, arg))

    if kind == "has_fields":
        fields = arg if isinstance(arg, list) else [arg]
        out = F.lit(True)
        for fld in fields:
            if not has_path(df.schema, fld):
                return F.lit(False)
            out = out & get_path(df, fld).isNotNull()
        return out

    out = F.lit(True)
    if kind == "equals":
        for fld, col, present, val in _leaf_fields(df, arg):
            if not present:
                return F.lit(False)
            ftype = path_type(df.schema, fld)
            if isinstance(val, bool):
                lhs = col if isinstance(ftype, T.BooleanType) else col.try_cast("boolean")
            elif isinstance(val, int):
                lhs = col if isinstance(ftype, _INTEGRAL) else col.try_cast("long")
            else:
                val = str(val)
                lhs = col if isinstance(ftype, T.StringType) else col.cast("string")
            # isNotNull & (=) instead of coalesce: identical semantics,
            # and both conjuncts push down into the parquet scan
            out = out & col.isNotNull() & (lhs == F.lit(val))
        return out
    if kind == "contains":
        for fld, col, present, val in _leaf_fields(df, arg):
            if not present:
                return F.lit(False)
            ftype = path_type(df.schema, fld)
            lhs = col if isinstance(ftype, T.StringType) else col.cast("string")
            out = out & col.isNotNull() & lhs.contains(str(val))
        return out
    if kind == "regexp":
        for fld, col, present, val in _leaf_fields(df, arg):
            if not present:
                return F.lit(False)
            ftype = path_type(df.schema, fld)
            lhs = col if isinstance(ftype, T.StringType) else col.cast("string")
            out = out & col.isNotNull() & lhs.rlike(str(val))
        return out
    if kind == "range":
        for fld, col, present, bounds in _leaf_fields(df, arg):
            if not present:
                return F.lit(False)
            ftype = path_type(df.schema, fld)
            numeric = isinstance(ftype, _NUMERIC)
            num = col if numeric else col.try_cast("double")
            out = out & col.isNotNull()
            for op, v in bounds.items():
                lim = F.lit(v if numeric else float(v))
                if op == "gt":
                    out = out & (num > lim)
                elif op == "gte":
                    out = out & (num >= lim)
                elif op == "lt":
                    out = out & (num < lim)
                elif op == "lte":
                    out = out & (num <= lim)
                else:
                    raise ValueError(f"range: unknown op {op!r}")
        return out
    if kind == "network":
        for _fld, col, present, nets in _leaf_fields(df, arg):
            if not present:
                return F.lit(False)
            nets = nets if isinstance(nets, list) else [nets]
            cidrs: list[str] = []
            for n in nets:
                cidrs.extend(NAMED_NETWORKS.get(n, [n]))
            leaf = F.lit(False)
            ip = col.cast("string")
            for c in cidrs:
                leaf = leaf | _cidr_match(ip, c)
            out = out & _false_if_null(leaf)
        return out
    raise ValueError(f"unknown condition kind: {kind!r}")
