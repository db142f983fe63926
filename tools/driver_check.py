"""Simulate the driver's correctness gate locally.

Runs ``__spark_entry__.entry`` as a smoke check, then every
``queries()[name]`` at the given sf dir and compares row-count, column
names, and order-insensitive values against ``oracle_sql()[name]``
executed by DuckDB over the same parquet files.

Usage: python tools/driver_check.py [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from inverted_index_and_search_spark.session import get_spark  # noqa: E402

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


def compare(sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    spark = get_spark(app_name="driver_check", master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8",
                            "spark.driver.memory": "8g"})
    failures = 0

    res = entrymod.entry(spark)
    rows = res.collect()
    print(f"entry(): {len(rows)} rows, schema={res.columns} -> OK")

    oracles = entrymod.oracle_sql()
    for name, fn in entrymod.queries().items():
        sdf = fn(spark, sf_dir)
        srows = [tuple(_norm(v) for v in r) for r in sdf.collect()]
        scols = [c.lower() for c in sdf.columns]
        if name not in oracles:
            print(f"{name}: rows-only check, {len(srows)} rows")
            continue
        drel = con.execute(oracles[name])
        dcols = [d[0].lower() for d in drel.description]
        drows = [tuple(_norm(v) for v in r) for r in drel.fetchall()]
        ok_cols = sorted(scols) == sorted(dcols)
        # order-insensitive compare with column-name alignment
        sidx = [scols.index(c) for c in sorted(scols)]
        didx = [dcols.index(c) for c in sorted(dcols)] if ok_cols else []
        sset = sorted(tuple(r[i] for i in sidx) for r in srows)
        dset = sorted(tuple(r[i] for i in didx) for r in drows) if ok_cols else []
        ok = ok_cols and len(srows) == len(drows) and sset == dset
        status = "OK" if ok else "FAIL"
        print(f"{name}: spark={len(srows)} duck={len(drows)} cols_match={ok_cols} -> {status}")
        if not ok:
            failures += 1
            if not ok_cols:
                print(f"  spark cols={scols} duck cols={dcols}")
            else:
                diff_s = [r for r in sset if r not in set(dset)][:3]
                diff_d = [r for r in dset if r not in set(sset)][:3]
                print(f"  only-spark: {diff_s}\n  only-duck:  {diff_d}")
    spark.stop()
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = compare(sf)
    print("ALL OK" if n == 0 else f"{n} FAILURES")
    sys.exit(1 if n else 0)
