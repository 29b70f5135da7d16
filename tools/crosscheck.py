"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle on DuckDB at a given sf, compare
row-count + sorted-column value multiset.

Usage: python tools/crosscheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
from collections import Counter

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(rows, columns):
    """Order-insensitive multiset of rows with columns sorted by name."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = Counter()
    for row in rows:
        key = tuple(_norm_val(row[i]) for i in order)
        out[key] += 1
    return out


def _norm_val(v):
    import datetime
    import math

    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return str(v)
    if isinstance(v, bool):
        return bool(v)
    return v


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from osm_read_enhanced_spark.session import get_spark

    spark = get_spark("crosscheck", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "8")),
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = dict(entry_mod.queries())
    oracles = dict(entry_mod.oracle_sql())
    # the overflow registry gets identical local validation (the driver
    # gate caps at 50 entries; see COVERAGE.md §catalog)
    if hasattr(entry_mod, "queries_extended"):
        qs.update(entry_mod.queries_extended())
        oracles.update(entry_mod.oracle_sql_extended())
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {type(e).__name__}: {str(e)[:200]}"))
            print(f"{name:28s} SPARK-ERROR {type(e).__name__}")
            continue
        if name not in oracles:
            print(f"{name:28s} rows-only   n={len(rows)}")
            if len(rows) == 0 and name not in ("q29_minhash_dups",):
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append((name, f"ORACLE ERROR: {str(e)[:200]}"))
            print(f"{name:28s} ORACLE-ERROR {str(e)[:120]}")
            continue
        if sorted(cols) != sorted(ocols):
            failures.append((name, f"schema mismatch: spark={sorted(cols)} duck={sorted(ocols)}"))
            print(f"{name:28s} SCHEMA-MISMATCH {sorted(cols)} vs {sorted(ocols)}")
            continue
        a = normalize(rows, cols)
        b = normalize(orows, ocols)
        if a == b:
            print(f"{name:28s} OK          n={len(rows)}")
        else:
            only_a = list((a - b).items())[:3]
            only_b = list((b - a).items())[:3]
            failures.append((name, f"VALUE mismatch n_spark={len(rows)} n_duck={len(orows)} "
                                   f"spark_only={only_a} duck_only={only_b}"))
            print(f"{name:28s} VALUE-MISMATCH n={len(rows)}/{len(orows)}")
            for x in only_a:
                print("   spark-only:", x)
            for x in only_b:
                print("   duck-only :", x)
    print()
    if failures:
        print(f"FAILURES ({len(failures)}):")
        for n, msg in failures:
            print(" -", n, "::", msg)
        sys.exit(1)
    print("ALL QUERIES MATCH")


if __name__ == "__main__":
    main()
