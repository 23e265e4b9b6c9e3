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
