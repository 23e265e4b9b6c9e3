"""Processor framework: config list → composed DataFrame plan.

The reference runs processors serially per event; nil return = drop
(libbeat/processors/processor.go:189-202), with ``when`` guards
(conditionals.go:60-91) and ``if/then/else`` (conditionals.go:113-175).

Here a Stage declares itself in one of three shapes so conditions can be
fused into the SAME projection instead of branching per row:

- *project*: ``updates() -> {dotted_path: Column}`` (+ ``drops()``) — under
  ``when``, each update becomes ``F.when(cond, new).otherwise(old)``;
- *filter*: ``keep() -> Column`` — under ``when`` it becomes
  ``~cond | keep`` (drop only matching rows);
- *custom*: ``custom(df) -> df`` (mapInPandas etc.) — under ``when`` the
  frame is split, transformed, and unioned back (rare; only ``script``).

Everything stays a single declarative plan: Catalyst sees through all of it.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import Column, DataFrame, functions as F

from beats_spark.conditions import compile_condition
from beats_spark.event import (drop_path, get_path, has_path, with_path,
                               with_paths)

_cond_counter = itertools.count()


def _paths_overlap(updates: dict[str, "Column"]) -> bool:
    """True when any update path is a segment-prefix of another (writes
    then depend on application order)."""
    paths = list(updates)
    pref = {tuple(p.split(".")) for p in paths}
    for p in paths:
        parts = p.split(".")
        for k in range(1, len(parts)):
            if tuple(parts[:k]) in pref:
                return True
    return False


class Stage:
    """Base processor stage. Subclasses override one shape."""

    name = "stage"

    def updates(self, df: DataFrame) -> dict[str, Column]:
        return {}

    def drops(self, df: DataFrame) -> list[str]:
        return []

    def keep(self, df: DataFrame) -> Column | None:
        return None

    def custom(self, df: DataFrame) -> DataFrame | None:
        return None

    # -- application ------------------------------------------------------

    def apply(self, df: DataFrame, cond: Column | None = None) -> DataFrame:
        out = self.custom(df)
        if out is not None:
            if cond is None:
                return out
            return self._apply_custom_cond(df, cond)

        keep = self.keep(df)
        if keep is not None:
            # NULL-safe guard: a when-condition that evaluates NULL per row
            # (e.g. equals' try_cast failing) means "condition false" in the
            # reference — ~NULL would otherwise stay NULL and the filter
            # would DROP the row
            return df.filter(
                keep if cond is None
                else (~F.coalesce(cond, F.lit(False)) | keep)
            )

        ups = self.updates(df)
        if _paths_overlap(ups):
            # one update path is a prefix of another: order-dependent —
            # keep the exact sequential semantics, including per-write
            # has_path against the EVOLVING schema for the cond fallback
            for path, new in ups.items():
                if cond is not None:
                    old = (get_path(df, path) if has_path(df.schema, path)
                           else F.lit(None))
                    new = F.when(cond, new).otherwise(old)
                df = with_path(df, path, new)
        else:
            if cond is not None:
                ups = {
                    path: F.when(cond, new).otherwise(
                        get_path(df, path) if has_path(df.schema, path)
                        else F.lit(None))
                    for path, new in ups.items()
                }
            # one batched write: 3 eager plan analyses total instead of 3
            # per path (user_agent alone writes 7 paths — measured ~1 s of
            # driver time per apply in the sequential form)
            df = with_paths(df, ups)
        for path in self.drops(df):
            if cond is None:
                df = drop_path(df, path)
            elif has_path(df.schema, path):
                # per-row "delete" under a condition: null out for matches
                df = with_path(df, path, F.when(cond, F.lit(None)).otherwise(get_path(df, path)))
        return df

    def _apply_custom_cond(self, df: DataFrame, cond: Column) -> DataFrame:
        tag = f"__when_{next(_cond_counter)}"
        df = df.withColumn(tag, cond)
        matched = self.custom(df.filter(F.col(tag)))
        assert matched is not None
        rest = df.filter(~F.coalesce(F.col(tag), F.lit(False)))
        return matched.unionByName(rest, allowMissingColumns=True).drop(tag)


@dataclass
class FnStage(Stage):
    """Adapter for simple function-shaped stages."""

    name: str = "fn"
    updates_fn: Callable[[DataFrame], dict[str, Column]] | None = None
    drops_fn: Callable[[DataFrame], list[str]] | None = None
    keep_fn: Callable[[DataFrame], Column] | None = None
    custom_fn: Callable[[DataFrame], DataFrame] | None = None

    def updates(self, df: DataFrame) -> dict[str, Column]:
        return self.updates_fn(df) if self.updates_fn else {}

    def drops(self, df: DataFrame) -> list[str]:
        return self.drops_fn(df) if self.drops_fn else []

    def keep(self, df: DataFrame) -> Column | None:
        return self.keep_fn(df) if self.keep_fn else None

    def custom(self, df: DataFrame) -> DataFrame | None:
        return self.custom_fn(df) if self.custom_fn else None


@dataclass
class WhenStage(Stage):
    """``when:`` guard around another stage (WhenProcessor,
    conditionals.go:60-91)."""

    inner: Stage = field(default_factory=Stage)
    when_cfg: dict[str, Any] = field(default_factory=dict)
    name = "when"

    def apply(self, df: DataFrame, cond: Column | None = None) -> DataFrame:
        c = compile_condition(df, self.when_cfg)
        if cond is not None:
            c = cond & c
        return self.inner.apply(df, c)


@dataclass
class IfThenElseStage(Stage):
    """``if/then/else`` (IfThenElseProcessor, conditionals.go:113-175).

    The condition is materialized into a temp column FIRST so then-stages
    that rewrite fields the condition reads can't change which branch a row
    takes — matching the reference's evaluate-then-execute order.
    """

    cond_cfg: dict[str, Any] = field(default_factory=dict)
    then_stages: list[Stage] = field(default_factory=list)
    else_stages: list[Stage] = field(default_factory=list)
    name = "if"

    def apply(self, df: DataFrame, cond: Column | None = None) -> DataFrame:
        tag = f"__if_{next(_cond_counter)}"
        c = compile_condition(df, self.cond_cfg)
        if cond is not None:
            c = cond & c
        df = df.withColumn(tag, F.coalesce(c, F.lit(False)))
        for st in self.then_stages:
            df = st.apply(df, F.col(tag))
        for st in self.else_stages:
            df = st.apply(df, ~F.col(tag))
        return df.drop(tag)


# -- registry --------------------------------------------------------------

_REGISTRY: dict[str, Callable[[dict[str, Any]], Stage]] = {}


def register(name: str):
    def deco(builder: Callable[[dict[str, Any]], Stage]):
        _REGISTRY[name] = builder
        return builder
    return deco


def build_stage(name: str, cfg: dict[str, Any]) -> Stage:
    if name not in _REGISTRY:
        raise ValueError(f"unknown processor: {name!r} (have: {sorted(_REGISTRY)})")
    cfg = dict(cfg or {})
    when_cfg = cfg.pop("when", None)
    stage = _REGISTRY[name](cfg)
    stage.name = name
    if when_cfg is not None:
        stage = WhenStage(inner=stage, when_cfg=when_cfg)
        stage.name = f"when({name})"
    return stage


def build_chain(processors_cfg: list[dict[str, Any]]) -> list[Stage]:
    """YAML-shaped list → stages (processors.New, processor.go:72-123)."""
    stages: list[Stage] = []
    for block in processors_cfg:
        if "if" in block:
            then_cfg = block.get("then", [])
            else_cfg = block.get("else", [])
            stages.append(
                IfThenElseStage(
                    cond_cfg=block["if"],
                    then_stages=build_chain(then_cfg),
                    else_stages=build_chain(else_cfg),
                )
            )
            continue
        if len(block) != 1:
            raise ValueError(f"processor block must have one key: {block!r}")
        (name, cfg), = block.items()
        stages.append(build_stage(name, cfg))
    return stages


def apply_chain(df: DataFrame, stages: list[Stage]) -> DataFrame:
    for st in stages:
        df = st.apply(df)
    return df
