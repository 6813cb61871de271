"""Local mimic of the driver's correctness gate: run each queries()
entry on Spark at sf0.01, run the matching oracle_sql() in DuckDB over
the same parquet, compare row count + schema-sorted values.

Usage: python scripts/check_oracle.py [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from networkit_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    """Type-strict normalization: the driver hashes stringified values,
    so an int 89 vs float 89.0 (e.g. DuckDB HUGEINT -> pandas float)
    must FAIL here too, not compare equal under Python ==."""
    import numbers

    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, numbers.Integral):
        return ("i", int(v))
    if isinstance(v, numbers.Real):
        f = float(v)
        if math.isnan(f):
            return ("f", "nan")
        return ("f", round(f, 9))
    return ("x", str(v))


def main(selected: list[str]) -> int:
    import time as _time

    t_start = _time.time()
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if selected and name not in selected:
            continue
        import time

        t0 = time.time()
        sdf = fn(spark, SF_DIR)
        scols = sorted(sdf.columns)
        srows = sorted(
            tuple(norm(r[c]) for c in scols) for r in sdf.collect()
        )
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"{name:24s} rows={len(srows):6d}  (no oracle — rows-only) "
                  f"spark={t_spark:.1f}s")
            continue
        t0 = time.time()
        ddf = con.execute(oracles[name]).fetch_df()
        dcols = sorted(ddf.columns)
        drows = sorted(
            tuple(norm(v) for v in row)
            for row in ddf[dcols].itertuples(index=False, name=None)
        )
        t_duck = time.time() - t0
        ok_schema = scols == dcols
        ok_count = len(srows) == len(drows)
        ok_vals = srows == drows
        status = "OK" if (ok_schema and ok_count and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{name:24s} {status}  rows={len(srows)}/{len(drows)} "
            f"schema={'=' if ok_schema else f'{scols} vs {dcols}'} "
            f"spark={t_spark:.1f}s duck={t_duck:.1f}s"
        )
        if not ok_vals and ok_schema and ok_count:
            for a, b in zip(srows, drows):
                if a != b:
                    print(f"    first diff:\n    spark {a}\n    duck  {b}")
                    break
    print(f"TOTAL {_time.time() - t_start:.1f}s failures={failures}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
