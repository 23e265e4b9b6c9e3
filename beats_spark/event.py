"""Dotted-path column helpers — the columnar analogue of Beats' MapStr.

The reference mutates row documents in place with dotted-path resolution
(common.MapStr: mapFind at libbeat/common/mapstr.go:444-482, Put/GetValue/
Delete at mapstr.go:124-201, AddTags at mapstr.go:377-412). Here a "path"
addresses nested StructType columns and every "mutation" is a projection the
optimizer can see through: set = struct rebuild via Column.withField, delete
= Column.dropFields, tags = array_union. All plan-time; nothing per-row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T


def split_path(path: str) -> list[str]:
    return path.split(".")


def _quote(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


def col_path(path: str) -> Column:
    """Column reference for a dotted path (each segment backtick-quoted)."""
    return F.col(".".join(_quote(p) for p in split_path(path)))


def has_path(schema: T.StructType, path: str) -> bool:
    """True if the dotted path resolves to a field in the schema."""
    cur: T.DataType = schema
    for part in split_path(path):
        if not isinstance(cur, T.StructType) or part not in cur.fieldNames():
            return False
        cur = cur[part].dataType
    return True


def path_type(schema: T.StructType, path: str) -> T.DataType | None:
    cur: T.DataType = schema
    for part in split_path(path):
        if not isinstance(cur, T.StructType) or part not in cur.fieldNames():
            return None
        cur = cur[part].dataType
    return cur


def get_path(df: DataFrame, path: str, default: Column | None = None) -> Column:
    """Missing-safe read: resolves to NULL (or ``default``) if absent."""
    if has_path(df.schema, path):
        return col_path(path)
    return default if default is not None else F.lit(None)


def _fresh_struct(parts: list[str], value: Column) -> Column:
    out = value
    for p in reversed(parts):
        out = F.struct(out.alias(p))
    return out


def _null_struct(t: T.StructType) -> Column:
    """A non-NULL struct value whose every field is NULL — the writable
    stand-in for a per-row NULL struct (withField on a NULL struct returns
    NULL, silently losing the set; MapStr.Put creates intermediates for
    every event, mapstr.go:462-478)."""
    return F.struct(
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in t.fields]
    )


def _writable(parent: Column, t: T.StructType) -> Column:
    return F.when(parent.isNotNull(), parent).otherwise(_null_struct(t))


def _set_nested(parent: Column, parent_type: T.StructType, parts: list[str], value: Column) -> Column:
    orig = parent
    parent = _writable(parent, parent_type)
    name = parts[0]
    if len(parts) == 1:
        out = parent.withField(_quote(name), value)
    else:
        child_t = parent_type[name].dataType if name in parent_type.fieldNames() else None
        if isinstance(child_t, T.StructType):
            out = parent.withField(
                _quote(name), _set_nested(parent.getField(name), child_t, parts[1:], value)
            )
        else:
            # child missing (or a scalar being overwritten): build the chain
            # fresh, matching MapStr.Put which creates intermediate maps
            # (mapstr.go:462-478).
            out = parent.withField(_quote(name), _fresh_struct(parts[1:], value))
    # Conditional processors write when(cond, v).otherwise(old NULL); rows the
    # processor left untouched must keep parent=NULL instead of flipping to an
    # all-null struct (MapStr.Put only creates intermediates for events the
    # processor actually ran on).
    return F.when(orig.isNull() & value.isNull(), F.lit(None)).otherwise(out)


def _tmp_name(df: DataFrame) -> str:
    """Staging-column name guaranteed absent from df (a user column named
    __with_path_value__ must survive a with_path call untouched). Compared
    case-insensitively: Spark resolution is case-insensitive by default, so
    withColumn would REPLACE a column differing only in case."""
    name, i = "__with_path_value__", 0
    existing = {c.lower() for c in df.columns}
    while name.lower() in existing:
        i += 1
        name = f"__with_path_value_{i}__"
    return name


def with_path(df: DataFrame, path: str, value: Column) -> DataFrame:
    """Set/overwrite a (possibly nested) field; creates intermediates."""
    parts = split_path(path)
    root = parts[0]
    if len(parts) == 1:
        return df.withColumn(root, value)
    if root in df.schema.fieldNames():
        root_t = df.schema[root].dataType
        if isinstance(root_t, T.StructType):
            # Stage the value as a temp column first: _set_nested references
            # it at every nesting level (leaf write + NULL-restore guard), and
            # inlining a large expression tree that many times blows up
            # codegen. As an attribute reference it stays cheap, and
            # CollapseProject (SPARK-36718) won't re-inline an expensive
            # multi-referenced alias.
            tmp = _tmp_name(df)
            staged = df.withColumn(tmp, value)
            out = staged.withColumn(
                root,
                _set_nested(F.col(_quote(root)), root_t, parts[1:], F.col(tmp)),
            )
            return out.drop(tmp)
        # scalar root being turned into an object — MapStr.Put would error;
        # we overwrite (documented divergence, keeps the plan total).
    # Fresh root: keep it NULL on rows the processor left untouched (leaf
    # value NULL) instead of materializing an all-null struct — same
    # MapStr.Put fidelity as above, same staging trick for codegen size.
    tmp = _tmp_name(df)
    staged = df.withColumn(tmp, value)
    vref = F.col(tmp)
    out = staged.withColumn(
        root,
        F.when(vref.isNull(), F.lit(None))
        .otherwise(_fresh_struct(parts[1:], vref)),
    )
    return out.drop(tmp)


def _fresh_tree(tree: dict) -> Column:
    return F.struct(*[
        (_fresh_tree(sub) if isinstance(sub, dict) else sub).alias(name)
        for name, sub in tree.items()
    ])


def _leaf_values(tree: dict) -> list[Column]:
    out: list[Column] = []
    for sub in tree.values():
        out.extend(_leaf_values(sub) if isinstance(sub, dict) else [sub])
    return out


def _all_null(values: list[Column]) -> Column:
    cond = values[0].isNull()
    for v in values[1:]:
        cond = cond & v.isNull()
    return cond


def _set_tree(parent: Column, parent_type: T.StructType, tree: dict) -> Column:
    """Multi-leaf generalization of _set_nested: writes EVERY (sub)field of
    ``tree`` into ``parent`` in one pass, with the same per-level NULL
    restore (a NULL parent stays NULL only when every value written at or
    below that level is NULL — exactly what sequential _set_nested calls
    converge to)."""
    orig = parent
    out = _writable(parent, parent_type)
    for name, sub in tree.items():
        if isinstance(sub, dict):
            child_t = (parent_type[name].dataType
                       if name in parent_type.fieldNames() else None)
            if isinstance(child_t, T.StructType):
                v = _set_tree(parent.getField(name), child_t, sub)
            else:
                v = _fresh_tree(sub)
        else:
            v = sub
        out = out.withField(_quote(name), v)
    return F.when(orig.isNull() & _all_null(_leaf_values(tree)),
                  F.lit(None)).otherwise(out)


def with_paths(df: DataFrame, updates: dict[str, Column]) -> DataFrame:
    """Set several (possibly nested) fields with a BOUNDED number of eager
    plan analyses: one staging projection for all values, one projection
    writing every touched root, one drop — instead of with_path's three
    eager ops PER path (measured ~0.15 s of driver time each on plans
    carrying large expression trees; user_agent writes 7 paths).

    Semantics notes:
    - values are resolved against the INPUT frame (snapshot semantics); a
      value that must read another entry's target should substitute that
      entry's VALUE expression instead (see copy_fields' chaining) — the
      sequential loop's read-your-writes by NAME is not reproduced;
    - when one update path is a segment-prefix of another (inherently
      order-dependent) this falls back to exactly the sequential loop;
    - a subtree written with all-NULL values materializes as a struct of
      NULLs when a sibling value is non-NULL (the sequential loop's result
      for that corner depended on write ORDER; this is the normalized,
      order-independent form). A root whose every written value is NULL
      stays NULL, same as with_path."""
    if len(updates) <= 1:
        for p, v in updates.items():
            df = with_path(df, p, v)
        return df
    # build one {field: value-or-subtree} tree per root column; bail to the
    # sequential loop on prefix-overlapping paths
    trees: dict[str, object] = {}
    for path, value in updates.items():
        parts = split_path(path)
        if len(parts) == 1:
            if parts[0] in trees:
                return _with_paths_seq(df, updates)
            trees[parts[0]] = value
            continue
        node = trees.setdefault(parts[0], {})
        if not isinstance(node, dict):
            return _with_paths_seq(df, updates)
        for p in parts[1:-1]:
            nxt = node.setdefault(p, {})
            if not isinstance(nxt, dict):
                return _with_paths_seq(df, updates)
            node = nxt
        if parts[-1] in node:
            return _with_paths_seq(df, updates)
        node[parts[-1]] = value

    # stage every leaf value once (one projection), then write roots from
    # cheap attribute refs (same codegen-size rationale as with_path).
    # Collision set includes the UPDATE TARGET roots: a user column
    # literally named __wpN__ being written must not be claimed as a temp
    # and then dropped (with_path's _tmp_name hardening, kept here)
    existing = {c.lower() for c in df.columns} | {r.lower() for r in trees}
    temps: dict[str, Column] = {}
    ref_trees: dict[str, object] = {}
    i = 0

    def stage(value: Column) -> Column:
        nonlocal i
        while f"__wp{i}__" in existing:
            i += 1
        name = f"__wp{i}__"
        i += 1
        temps[name] = value
        return F.col(name)

    def refit(tree):
        if isinstance(tree, dict):
            return {k: refit(v) for k, v in tree.items()}
        return stage(tree)

    for root, tree in trees.items():
        ref_trees[root] = refit(tree)
    staged = df.withColumns(temps)

    root_cols: dict[str, Column] = {}
    for root, tree in ref_trees.items():
        if not isinstance(tree, dict):
            root_cols[root] = tree
            continue
        root_t = (df.schema[root].dataType
                  if root in df.schema.fieldNames() else None)
        if isinstance(root_t, T.StructType):
            root_cols[root] = _set_tree(F.col(_quote(root)), root_t, tree)
        else:
            # fresh (or scalar-overwritten) root: NULL when every written
            # value is NULL — the with_path fresh-root guard, multi-leaf
            root_cols[root] = F.when(
                _all_null(_leaf_values(tree)), F.lit(None)
            ).otherwise(_fresh_tree(tree))
    return staged.withColumns(root_cols).drop(*temps)


def _with_paths_seq(df: DataFrame, updates: dict[str, Column]) -> DataFrame:
    for p, v in updates.items():
        df = with_path(df, p, v)
    return df


def drop_path(df: DataFrame, path: str) -> DataFrame:
    """Delete a field if present (no-op when missing, like Delete with
    ignore_missing)."""
    if not has_path(df.schema, path):
        return df
    parts = split_path(path)

    def type_at(ps: list[str]) -> T.DataType | None:
        cur: T.DataType = df.schema
        for p in ps:
            if not isinstance(cur, T.StructType) or p not in cur.fieldNames():
                return None
            cur = cur[p].dataType
        return cur

    # a struct must never be left EMPTY (Spark refuses with
    # CANNOT_DROP_ALL_FIELDS): when the immediate parent holds only this
    # field, drop the parent instead — recursively, the columnar analogue
    # of the reference's scrub of emptied maps (e.g. dropping
    # system.syslog.timestamp when it is syslog's last field removes
    # system.syslog; if syslog was system's last field, system goes too)
    while len(parts) > 1:
        parent_t = type_at(parts[:-1])
        if isinstance(parent_t, T.StructType) and len(parent_t.fields) == 1:
            parts = parts[:-1]
            continue
        break
    if len(parts) == 1:
        return df.drop(parts[0])
    root = parts[0]
    nested = ".".join(_quote(p) for p in parts[1:])
    return df.withColumn(root, F.col(_quote(root)).dropFields(nested))


def rename_path(df: DataFrame, src: str, dst: str) -> DataFrame:
    """Move a field (actions/rename.go:75 renameField = copy + delete)."""
    df = with_path(df, dst, get_path(df, src))
    return drop_path(df, src)


def tags_expr(df: DataFrame, tags: list[str], target: str = "tags") -> Column:
    """Expression appending tags to an array field, creating it if needed
    (MapStr.AddTagsWithKey, mapstr.go:390-412; de-dup preserving order is
    NOT done by the reference, so plain concat)."""
    existing = get_path(df, target)
    existing_t = path_type(df.schema, target)
    if isinstance(existing_t, T.ArrayType):
        base = F.coalesce(existing, F.array().cast("array<string>"))
    elif isinstance(existing_t, T.StringType):
        # reference wraps a scalar string into an array (mapstr.go:399-403)
        base = F.when(existing.isNull(), F.array().cast("array<string>")).otherwise(F.array(existing))
    else:
        base = F.array().cast("array<string>")
    return F.concat(base, F.array(*[F.lit(t) for t in tags]))


def add_tags(df: DataFrame, tags: list[str], target: str = "tags") -> DataFrame:
    return with_path(df, target, tags_expr(df, tags, target))


def append_flag(df: DataFrame, flag: str, cond: Column | None = None,
                path: str = "log.flags") -> DataFrame:
    """Append a value to log.flags (beat.FlagField semantics), optionally
    only on rows matching ``cond``; used for *_parsing_error / truncated."""
    existing = get_path(df, path)
    existing_t = path_type(df.schema, path)
    if isinstance(existing_t, T.ArrayType):
        base = F.coalesce(existing, F.array().cast("array<string>"))
    else:
        base = F.array().cast("array<string>")
    appended = F.array_union(base, F.array(F.lit(flag)))
    if cond is not None:
        new_val = F.when(cond, appended).otherwise(
            existing if existing_t is not None else F.lit(None).cast("array<string>")
        )
    else:
        new_val = appended
    return with_path(df, path, new_val)


def set_error_message(df: DataFrame, failed: Column, message: str) -> DataFrame:
    """Set ``error.message`` on failing rows while PRESERVING an earlier
    processor's message on rows that succeeded (the shared
    grok/dissect/syslog ``ignore_failure=False`` idiom)."""
    prev = (get_path(df, "error.message")
            if has_path(df.schema, "error.message")
            else F.lit(None).cast("string"))
    return with_path(df, "error.message",
                     F.when(failed, F.lit(message)).otherwise(prev))
