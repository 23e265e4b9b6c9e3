"""Regression pins for the round-4 review findings (grok alternation /
per-pattern types / gated extracts, enrich_cidr /0 + staging guard,
logfile json key promotion vs multiline order)."""

import json

import pytest

from beats_spark.processors import apply_chain, build_chain
from beats_spark.processors.enrich import register_lookup


def test_grok_same_field_alternation_participating_branch_wins(spark):
    """(?:%{IP:host}|%{HOSTNAME:host}) — the PARTICIPATING branch's value
    must win; the non-participating group extracts '' and must not shadow
    it (regressed when extracts were first staged; the apache module's
    source.address grok is this exact idiom)."""
    df = spark.createDataFrame(
        [("example.com",), ("1.2.3.4",)], "addr string")
    out = apply_chain(df, build_chain([
        {"grok": {"field": "addr",
                  "pattern": "(?:%{IP:host}|%{HOSTNAME:host})"}},
    ]))
    got = {r["addr"]: r["host"] for r in out.collect()}
    assert got == {"example.com": "example.com", "1.2.3.4": "1.2.3.4"}


def test_grok_per_pattern_type_casts(spark):
    """Each pattern's declared type applies to ITS capture site (ES
    converts per-pattern), not the first declaration across patterns."""
    df = spark.createDataFrame([("a=7 x",), ("9-b",)], "s string")
    out = apply_chain(df, build_chain([
        {"grok": {"field": "s", "patterns": [
            "a=%{NUMBER:v:long} %{WORD:k}",
            "%{NUMBER:v:long}-%{WORD:k}",
        ]}},
    ]))
    rows = {r["k"]: r["v"] for r in out.collect()}
    assert rows == {"x": 7, "b": 9}
    assert dict(out.dtypes)["v"] == "bigint"


def test_grok_multiline_only_winning_pattern_extracts(spark):
    """A field declared only by a losing pattern keeps its old value."""
    df = spark.createDataFrame([("hit 5", "keep")], "s string, extra string")
    out = apply_chain(df, build_chain([
        {"grok": {"field": "s", "patterns": [
            "hit %{NUMBER:n:long}",
            "miss %{WORD:extra}",
        ]}},
    ]))
    r = out.collect()[0]
    assert r["n"] == 5
    assert r["extra"] == "keep"


@pytest.fixture(scope="module")
def catchall_chain(spark):
    register_lookup(
        "catchall_geo",
        lambda: spark.createDataFrame(
            [("0.0.0.0/0", "any4"), ("::/0", "any6"),
             ("10.0.0.0/8", "corp")],
            "cidr string, region string"))
    return build_chain([
        {"enrich_cidr": {"lookup": "catchall_geo", "on": "ip",
                         "target": "geo"}},
    ])


@pytest.mark.parametrize("ip,region", [
    ("1.2.3.4", "any4"),        # /0 catch-all works for real addresses
    ("10.9.9.9", "corp"),       # longest prefix still beats /0
    ("::5", "any6"),
    ("garbage", None),          # unparseable ip must NOT hit the /0 row
    (None, None),               # NULL ip must NOT hit the /0 row
])
def test_cidr_zero_prefix_catchall_never_matches_invalid(
        spark, catchall_chain, ip, region):
    df = spark.createDataFrame([(ip,)], "ip string")
    r = apply_chain(df, catchall_chain).collect()[0]
    got = r["geo"]["region"] if r["geo"] is not None else None
    assert got == region


def test_cidr_staging_guard_covers_slice_columns(spark, catchall_chain):
    """User columns named like the join-slice staging columns must survive
    (the probe previously checked '__cidr_0', not '__cidr_k0'/'__cidr_p0')."""
    df = spark.createDataFrame(
        [("10.1.2.3", "u1", "u2")],
        "ip string, __cidr_k0 string, __cidr_p1 string")
    r = apply_chain(df, catchall_chain).collect()[0]
    assert r["__cidr_k0"] == "u1"
    assert r["__cidr_p1"] == "u2"
    assert r["geo"]["region"] == "corp"


def test_logfile_json_key_promotion_after_multiline(spark, tmp_path):
    """keys_under_root+overwrite_keys must not replace the raw line before
    the multiline reader runs: the pattern matches RAW line text (reference
    merges keys at event build, after the reader chain)."""
    from beats_spark.sources import read_log_files

    p = tmp_path / "a.log"
    lines = [
        json.dumps({"message": "first", "k": "a"}),
        json.dumps({"message": "  indent", "k": "b"}),
    ]
    p.write_text("\n".join(lines) + "\n")
    df = read_log_files(
        spark, str(tmp_path), glob="*.log",
        json={"keys_under_root": True, "overwrite_keys": True},
        json_schema="message string, k string",
        multiline={"pattern": r"^\{\"message\": \"  ",
                   "negate": False, "match": "after"},
    )
    rows = df.collect()
    # raw line 2 starts '{"message": "  ' → joined into line 1's event;
    # promotion then takes the FIRST line's parsed fields
    assert len(rows) == 1
    assert rows[0]["message"] == "first"
    assert rows[0]["k"] == "a"
