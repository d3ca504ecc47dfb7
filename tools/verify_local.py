"""Local replica of the driver's correctness gate.

Runs every queries() entry at the given sf_dir, runs the matching
oracle_sql() in DuckDB over the same parquet (tables registered as
views), and compares row count + column names + values with
order-insensitive, column-name-sorted comparison — STRICTER than the
driver's hash (exact equality, with a tiny float tolerance toggle to
diagnose near-misses).

Usage: python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
from datetime import date, datetime
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from matano_spark.session import get_spark  # noqa: E402
from matano_spark.tables import TABLE_NAMES  # noqa: E402


def norm_cell(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v


def normalize(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cols_sorted = [cols[i] for i in order]
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return cols_sorted, out


def cells_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if a == b:
            return True
        return math.isclose(a, b, rel_tol=0, abs_tol=0)  # exact; driver hashes
    return a == b


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    spark = get_spark("verify_local")
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    n_pass = n_fail = n_rowsonly = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue

        s_cols, s_rows = normalize(scols, [tuple(r) for r in srows])
        d_cols, d_rows = normalize(dcols, drows)
        status = None
        if [c.lower() for c in s_cols] != [c.lower() for c in d_cols]:
            status = f"column mismatch: spark={s_cols} duck={d_cols}"
        elif len(s_rows) != len(d_rows):
            status = f"row count: spark={len(s_rows)} duck={len(d_rows)}"
        else:
            for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
                bad = [
                    (s_cols[j], sv, dv)
                    for j, (sv, dv) in enumerate(zip(sr, dr))
                    if not cells_equal(sv, dv)
                ]
                if bad:
                    status = f"row {i} diff: {bad[:3]}"
                    break
        if status:
            print(f"FAIL  {name}: {status}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(s_rows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
