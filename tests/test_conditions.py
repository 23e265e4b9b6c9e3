"""Condition language tests — semantics pinned to libbeat/conditions
(equals/contains/regexp/range/has_fields/network/and/or/not), including the
missing-field-is-false rule."""

import pytest
from pyspark.sql import functions as F

from beats_spark.conditions import compile_condition


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        ("a", 1, 10.0, "10.0.0.5", True, "hello world"),
        ("b", 2, 99.5, "8.8.8.8", False, "goodbye"),
        ("c", 3, 100.0, "192.168.1.1", True, None),
        (None, 4, 150.0, "127.0.0.1", None, "hello again"),
    ]
    return spark.createDataFrame(
        rows, "name string, n int, v double, ip string, flag boolean, msg string"
    )


def names(df, cond):
    return [r["n"] for r in df.filter(cond).select("n").orderBy("n").collect()]


def test_equals_string(df):
    assert names(df, compile_condition(df, {"equals": {"name": "a"}})) == [1]


def test_equals_int_bool(df):
    assert names(df, compile_condition(df, {"equals": {"n": 2}})) == [2]
    assert names(df, compile_condition(df, {"equals": {"flag": True}})) == [1, 3]


def test_equals_multi_field_is_and(df):
    c = compile_condition(df, {"equals": {"name": "a", "n": 1}})
    assert names(df, c) == [1]
    c = compile_condition(df, {"equals": {"name": "a", "n": 2}})
    assert names(df, c) == []


def test_missing_field_is_false_not_error(df):
    assert names(df, compile_condition(df, {"equals": {"nope": "x"}})) == []
    assert names(df, compile_condition(df, {"contains": {"nope.deep": "x"}})) == []
    # not(missing) == true for all rows (reference: condition false, negated)
    assert names(df, compile_condition(df, {"not": {"equals": {"nope": "x"}}})) == [1, 2, 3, 4]


def test_contains_and_regexp(df):
    assert names(df, compile_condition(df, {"contains": {"msg": "hello"}})) == [1, 4]
    assert names(df, compile_condition(df, {"regexp": {"msg": "^good"}})) == [2]


def test_null_value_is_false(df):
    # row 3 has msg NULL — contains must be false, not null
    c = {"contains": {"msg": "o"}}
    assert names(df, compile_condition(df, c)) == [1, 2, 4]
    assert names(df, compile_condition(df, {"not": c})) == [3]


def test_range(df):
    c = compile_condition(df, {"range": {"v": {"gte": 99.5, "lt": 150}}})
    assert names(df, c) == [2, 3]


def test_has_fields(df):
    assert names(df, compile_condition(df, {"has_fields": ["name", "msg"]})) == [1, 2]
    assert names(df, compile_condition(df, {"has_fields": ["missing_col"]})) == []


def test_network(df):
    assert names(df, compile_condition(df, {"network": {"ip": "private"}})) == [1, 3]
    assert names(df, compile_condition(df, {"network": {"ip": "loopback"}})) == [4]
    assert names(df, compile_condition(df, {"network": {"ip": "8.8.0.0/16"}})) == [2]


def test_boolean_combinators(df):
    c = {
        "or": [
            {"equals": {"name": "a"}},
            {"and": [{"range": {"n": {"gte": 3}}}, {"not": {"network": {"ip": "loopback"}}}]},
        ]
    }
    assert names(df, compile_condition(df, c)) == [1, 3]


def test_condition_pushdown_reaches_scan(spark, tmp_path):
    """The compiled condition must appear as a pushed filter in the parquet
    scan — the optimizer benefit the reference can't have."""
    p = str(tmp_path / "t.parquet")
    spark.range(100).withColumn("name", F.concat(F.lit("u"), F.col("id"))).write.parquet(p)
    df = spark.read.parquet(p)
    cond = compile_condition(df, {"range": {"id": {"gt": 50}}})
    plan = df.filter(cond)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan" in plan


def test_network_ipv6(spark):
    """IPv6 CIDRs (network.go handles both families via net.ParseIP):
    zero-compression, embedded IPv4 tails, named networks, invalid input."""
    from beats_spark.conditions import compile_condition

    rows = [
        ("::1",), ("fe80::1234",), ("fd12:3456::1",), ("2001:db8::8a2e:370:7334",),
        ("::ffff:192.168.1.10",), ("ff02::fb",), ("not-an-ip",), (None,),
        ("1:2:3:4:5:6:7:8",), ("2001:db8:0:0:0:0:2:1",),
    ]
    df = spark.createDataFrame(rows, "ip string")

    def ips(cfg):
        return sorted(
            r["ip"] for r in df.filter(compile_condition(df, cfg)).collect())

    assert ips({"network": {"ip": "2001:db8::/32"}}) == [
        "2001:db8:0:0:0:0:2:1",
        "2001:db8::8a2e:370:7334",
    ]
    assert ips({"network": {"ip": "loopback"}}) == ["::1"]
    assert ips({"network": {"ip": "private"}}) == ["fd12:3456::1"]
    assert ips({"network": {"ip": "link_local_unicast"}}) == ["fe80::1234"]
    assert ips({"network": {"ip": "multicast"}}) == ["ff02::fb"]
    # embedded IPv4 tail is matchable as IPv6
    assert ips({"network": {"ip": "::ffff:192.168.0.0/112"}}) == [
        "::ffff:192.168.1.10"]
    # exact /128
    assert ips({"network": {"ip": "1:2:3:4:5:6:7:8"}}) == ["1:2:3:4:5:6:7:8"]
    # ipv4 rules never match ipv6 values and vice versa
    assert ips({"network": {"ip": "192.168.0.0/16"}}) == []


def test_network_ipv6_single_colon_invalid(spark):
    """A single leading/trailing ':' (not part of '::') is invalid per
    net.ParseIP; the empty-group filter must not silently accept it."""
    from beats_spark.conditions import compile_condition

    rows = [(":1:2:3:4:5:6:7:8",), ("1:2:3:4:5:6:7:8:",), (":fd12:3456::1",),
            ("1:2:3:4:5:6:7:8",), ("::1",)]
    df = spark.createDataFrame(rows, "ip string")
    got = sorted(r["ip"] for r in df.filter(
        compile_condition(df, {"network": {"ip": "1:2:3:4:5:6:7:8"}})).collect())
    assert got == ["1:2:3:4:5:6:7:8"]
    got = sorted(r["ip"] for r in df.filter(
        compile_condition(df, {"network": {"ip": "private"}})).collect())
    assert got == []
