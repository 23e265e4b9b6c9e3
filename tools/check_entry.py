"""Local replica of the driver's correctness gate: run every queries()
entry and its oracle_sql() side-by-side on a given sf dir, compare
row-count, column names, and an order-insensitive value hash.

Usage: python tools/check_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    # Plain str(), matching the driver's stringification: a float64 7558210.0
    # vs int64 7558210 MUST mismatch here (a %.9g normalization masked
    # exactly that DuckDB HUGEINT->float64 artifact in round 1).
    if v is None or v != v:
        return "<null>"
    return str(v)


def frame_hash(pdf: pd.DataFrame) -> str:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = sorted(
        "\x1f".join(norm_cell(v) for v in row) for row in pdf.itertuples(index=False)
    )
    import hashlib

    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from beats_spark.session import get_spark

    spark = get_spark("check_entry", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from '{p}'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    fails = []
    # a misspelled query name must not produce a false-green "0 failures"
    unknown = only - set(qs)
    if unknown:
        print(f"FAIL: unknown query name(s) {sorted(unknown)} "
              f"(known: {sorted(qs)})")
        sys.exit(2)
    # an oracle key orphaned by a query rename silently degrades the
    # renamed query to rows-only — fail loudly on the drift
    stale = set(oracles) - set(qs)
    if stale:
        print(f"FAIL: oracle_sql() keys without a queries() entry: "
              f"{sorted(stale)}")
        sys.exit(2)
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            fails.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(sdf)} rows, cols={sorted(sdf.columns)}")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            fails.append(name)
            print(f"FAIL {name}: duckdb error {str(e)[:300]}")
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} != {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} != {sorted(odf.columns)}")
        elif frame_hash(sdf) != frame_hash(odf):
            problems.append("value-hash mismatch")
            # diff sample: MULTISET difference over the same norm_cell
            # stringification the hash uses — set() difference printed
            # nothing for pure duplicate-count mismatches, and astype(str)
            # rendered nulls differently from the hash ('None'/'nan' vs
            # '<null>'), pointing the debugger at phantom rows
            from collections import Counter

            def norm_rows(pdf):
                key = sorted(pdf.columns)
                return Counter(
                    "\x1f".join(norm_cell(v) for v in row)
                    for row in pdf[key].itertuples(index=False))

            ca, cb = norm_rows(sdf), norm_rows(odf)
            for x in list((ca - cb).elements())[:3]:
                print(f"   spark-only: {x[:200]!r}")
            for x in list((cb - ca).elements())[:3]:
                print(f"   duck-only:  {x[:200]!r}")
        if problems:
            fails.append(name)
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"OK   {name}: {len(sdf)} rows")
    print(f"\n{len(fails)} failures" + (f": {fails}" if fails else ""))
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
