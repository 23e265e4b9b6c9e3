"""Property tests: random condition ASTs over random frames must match a
pure-pandas oracle row-for-row (the build-plan §7 step-2 contract).

Hypothesis generates nested and/or/not trees over equals/contains/regexp/
range/has_fields leaves on a frame with nulls; the oracle evaluates the
same AST in pandas with the reference's missing-field→False semantics.
"""

from __future__ import annotations

import re

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from beats_spark.conditions import compile_condition

COLS = ["s", "n", "b"]  # string, numeric, bool


@st.composite
def leaf(draw):
    kind = draw(st.sampled_from(
        ["equals_s", "equals_n", "equals_b", "contains", "regexp",
         "range", "has_fields", "missing_field"]))
    if kind == "equals_s":
        return {"equals": {"s": draw(st.sampled_from(["aa", "bx", "", "zz"]))}}
    if kind == "equals_n":
        return {"equals": {"n": draw(st.integers(-2, 5))}}
    if kind == "equals_b":
        return {"equals": {"b": draw(st.booleans())}}
    if kind == "contains":
        return {"contains": {"s": draw(st.sampled_from(["a", "b", "x", ""]))}}
    if kind == "regexp":
        return {"regexp": {"s": draw(st.sampled_from(["^a", "x$", "a.b", "[ab]+"]))}}
    if kind == "range":
        lo = draw(st.integers(-3, 3))
        hi = lo + draw(st.integers(0, 5))
        ops = draw(st.sampled_from([("gte", "lt"), ("gt", "lte"), ("gte",), ("lt",)]))
        spec = {}
        if "gte" in ops:
            spec["gte"] = lo
        if "gt" in ops:
            spec["gt"] = lo
        if "lt" in ops:
            spec["lt"] = hi
        if "lte" in ops:
            spec["lte"] = hi
        return {"range": {"n": spec}}
    if kind == "has_fields":
        return {"has_fields": draw(st.lists(st.sampled_from(COLS), min_size=1,
                                            max_size=2, unique=True))}
    return {"equals": {"nope_missing": "v"}}  # missing field → False


cond_ast = st.recursive(
    leaf(),
    lambda kids: st.one_of(
        st.builds(lambda a: {"not": a}, kids),
        st.builds(lambda a, b: {"and": [a, b]}, kids, kids),
        st.builds(lambda a, b: {"or": [a, b]}, kids, kids),
    ),
    max_leaves=6,
)


def oracle(row: pd.Series, ast: dict) -> bool:
    (op, arg), = ast.items()
    if op == "not":
        return not oracle(row, arg)
    if op == "and":
        return all(oracle(row, a) for a in arg)
    if op == "or":
        return any(oracle(row, a) for a in arg)
    if op == "has_fields":
        return all(f in row.index and row[f] is not None for f in arg)
    if op == "equals":
        (f, v), = arg.items()
        if f not in row.index or row[f] is None:
            return False
        return row[f] == v
    if op == "contains":
        (f, v), = arg.items()
        return row.get(f) is not None and v in row[f]
    if op == "regexp":
        (f, v), = arg.items()
        return row.get(f) is not None and re.search(v, row[f]) is not None
    if op == "range":
        (f, spec), = arg.items()
        x = row.get(f)
        if x is None:
            return False
        ok = True
        if "gte" in spec:
            ok &= x >= spec["gte"]
        if "gt" in spec:
            ok &= x > spec["gt"]
        if "lt" in spec:
            ok &= x < spec["lt"]
        if "lte" in spec:
            ok &= x <= spec["lte"]
        return bool(ok)
    raise AssertionError(op)


ROWS = [
    ("aa", 0, True), ("ab", 1, False), ("bx", -2, True), ("", 3, None),
    (None, None, True), ("axb", 5, False), ("zz", 2, None), ("ba", -1, True),
]


@pytest.fixture(scope="module")
def frame(spark):
    df = spark.createDataFrame(ROWS, "s string, n long, b boolean")
    df = df.cache()
    df.count()
    return df


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ast=cond_ast)
def test_condition_matches_pandas_oracle(spark, frame, ast):
    got = sorted(
        ((r["s"], r["n"], r["b"])
         for r in frame.filter(compile_condition(frame, ast)).collect()),
        key=str,
    )
    pdf = pd.DataFrame(ROWS, columns=["s", "n", "b"]).astype(object)
    pdf = pdf.where(pdf.notna(), None)
    want = sorted(
        (tuple(row) for _, row in pdf.iterrows() if oracle(row, ast)),
        key=str,
    )
    assert got == want
