"""pii_scrub and Gopher-style repetition signals (ml/textstats.py) —
training-data hygiene ops."""

import pytest
from pyspark.sql import functions as F

from beats_spark.ml.textstats import (gopher_keep, pii_scrub,
                                      repetition_signals)


def _one(spark, text, col_fn):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(col_fn(F.col("text")).alias("v")).collect()[0]["v"]


@pytest.mark.parametrize("raw,clean", [
    ("mail bob.smith+x@sub.example.org now",
     "mail <EMAIL> now"),
    ("from 10.1.2.3 and 255.255.255.255.", "from <IP> and <IP>."),
    ("token deadbeefdeadbeefdeadbeefdeadbeef ok",
     "token <KEY> ok"),
    ("call +1 (555) 010-1234 today", "call <PHONE> today"),
    ("dial +49 30 123456 now", "dial <PHONE> now"),
    ("office (0221) 47-110", "office <PHONE>"),
    # order: the dotted quad must become <IP>, not a phone match
    ("ip 192.0.2.77 stays ip", "ip <IP> stays ip"),
    # md5-length hex is a key even inside a sentence
    ("sig 0123456789abcdef0123456789abcdef.", "sig <KEY>."),
    # the conservative phone policy: ISO dates/timestamps and versions are
    # phone-shaped and must survive; bare local numbers are accepted
    # false negatives
    ("released 2026-08-18 at 12:30:45", "released 2026-08-18 at 12:30:45"),
    ("ts 2026-01-01 00:00:00 ok", "ts 2026-01-01 00:00:00 ok"),
    ("wget 1.20.3 and 555-010-9999", "wget 1.20.3 and 555-010-9999"),
    ("order 123\n 45678 units", "order 123\n 45678 units"),
    ("nothing to scrub here", "nothing to scrub here"),
])
def test_pii_scrub_shapes(spark, raw, clean):
    assert _one(spark, raw, pii_scrub) == clean


def test_pii_scrub_kinds_subset(spark):
    df = spark.createDataFrame([("a@b.co 10.0.0.1",)], "text string")
    out = df.select(
        pii_scrub(F.col("text"), kinds=["email"]).alias("v")
    ).collect()[0]["v"]
    assert out == "<EMAIL> 10.0.0.1"
    with pytest.raises(ValueError, match="unknown kinds"):
        pii_scrub(F.col("text"), kinds=["ssn"])


def test_repetition_signals(spark):
    text = "alpha beta\nalpha beta\n- item one\nend..."
    df = spark.createDataFrame([(text,)], "text string")
    r = repetition_signals(F.col("text"))
    row = df.select(*[v.alias(k) for k, v in r.items()]).collect()[0]
    assert row["n_lines"] == 4
    assert row["dup_line_frac"] == 0.25       # one duplicate of 4
    assert row["bullet_line_frac"] == 0.25
    assert row["ellipsis_line_frac"] == 0.25


@pytest.mark.parametrize("text,keep", [
    ("the quick brown fox jumps over the lazy dog near banks", True),
    # duplicate-line spam
    ("spam line\n" * 9 + "spam line", False),
    # bullets only
    ("- a\n- b\n- c\n- d", False),
    # degenerate mean word length (single chars)
    ("a b c d e f g h", False),
    ("", False),
])
def test_gopher_keep(spark, text, keep):
    assert _one(spark, text, gopher_keep) is keep
