"""Local differential verification: run every registry query on Spark AND
its oracle SQL on DuckDB over the same parquet, compare row count, column
names, and (rounded) values. A stricter local stand-in for the driver's
CORRECTNESS gate — run before committing new queries.

Usage: python tools/verify_local.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import math
import os
import sys
import time

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_DIR)

import duckdb  # noqa: E402


def _norm(v):
    if v is None:
        return "\0NULL"  # sortable sentinel (rollup/cube emit NULL keys)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round to 9 significant-ish digits; exact-decimal outputs should
        # match bit-for-bit, this guards residual float formatting noise
        return f"{v:.9g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def _rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in idx) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    filters = sys.argv[2:]

    from hadoop_common_spark.queries import load_all
    from hadoop_common_spark.session import get_spark
    from hadoop_common_spark.tables import TABLE_NAMES

    registry = load_all()
    spark = get_spark("verify-local")

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = n_rowsonly = 0
    failures = []
    for name, qd in sorted(registry.items()):
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        try:
            sdf = qd.fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            continue
        if qd.oracle is None:
            n_rowsonly += 1
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(qd.oracle)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            continue
        ok = True
        if sorted(scols) != sorted(dcols):
            ok = False
            print(f"FAIL  {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
        elif len(srows) != len(drows):
            ok = False
            print(f"FAIL  {name}: rowcount spark={len(srows)} duck={len(drows)}")
        else:
            s, d = _rowset(scols, srows), _rowset(dcols, drows)
            if s != d:
                ok = False
                diff = [(a, b) for a, b in zip(s, d) if a != b][:3]
                print(f"FAIL  {name}: value mismatch; first diffs: {diff}")
        if ok:
            n_pass += 1
            print(f"ok    {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
        else:
            n_fail += 1
            failures.append(name)

    print(f"\n{n_pass} ok, {n_rowsonly} rows-only, {n_fail} FAILED" + (f": {failures}" if failures else ""))
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
