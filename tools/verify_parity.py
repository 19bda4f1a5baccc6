"""Local stand-in for the driver's correctness gate.

Runs every catalog query on Spark and its oracle on DuckDB at the given
sf dir, then compares row count, column names, and an order-insensitive
value hash (rows sorted, columns sorted by name, values stringified with
repr-level fidelity). Exit code 1 if any query mismatches.

Usage: python tools/verify_parity.py [--touched[=REF]] [sf_dir] [query ...]

`--touched` (r12 verdict task 4) scopes the run to the catalog queries
that can observe the working tree's diff vs REF (default HEAD), computed
by the static scan in tools/touched.py — package import graph + per-name
catalog.py segment diff. Use it for MID-ROUND gates after localized
edits; closing runs still use the full gate. With an explicit query list,
the scope is the intersection.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from _lakehouse_architecture_for_e_commerce_transactions_spark.plans import (  # noqa: E402
    catalog,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.session import (  # noqa: E402
    get_spark,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.tables import (  # noqa: E402
    TESTDATA_TABLES,
)


def norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def table_hash(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    argv = sys.argv[1:]
    touched_base = None
    for a in list(argv):
        if a == "--touched" or a.startswith("--touched="):
            touched_base = a.partition("=")[2] or "HEAD"
            argv.remove(a)
    sf = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    if touched_base is not None:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import touched as touched_mod

        scope, notes = touched_mod.touched_queries(touched_base)
        for n in notes:
            print(f"# {n}")
        only = (only & scope) if only else scope
        print(f"# --touched scope: {len(only)} queries: {sorted(only)}")
        if not only:
            print("\n0/0 passed (no catalog query observes the diff)")
            return 0
    spark = get_spark("verify-parity")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    unknown = only - set(catalog.CATALOG)
    if unknown:
        print(f"unknown queries: {sorted(unknown)}")
        return 1
    failures = []
    checked = 0
    for name, qd in catalog.CATALOG.items():
        if only and name not in only:
            continue
        checked += 1
        t0 = time.time()
        try:
            df = qd.builder(spark, sf)
            s_cols = df.columns
            s_rows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        t1 = time.time()
        if qd.oracle is None:
            print(f"ok?  {name}: rows-only ({len(s_rows)} rows, {t1-t0:.1f}s)")
            continue
        try:
            # The driver round-trips oracle results through pandas, where
            # HUGEINT (DuckDB's type for sum-of-integer) degrades to float64
            # and hash-diverges from Spark's int64 ("5.0" vs "5"). fetchall()
            # below hides that (HUGEINT -> Python int), so flag it explicitly.
            desc = con.sql(f"DESCRIBE ({qd.oracle})").fetchall()
            huge = [c[0] for c in desc if "HUGEINT" in c[1]]
            if huge:
                print(
                    f"FAIL {name}: oracle outputs HUGEINT columns {huge} "
                    "(pandas degrades to float64 — CAST(... AS BIGINT))"
                )
                failures.append(name)
                continue
            res = con.execute(qd.oracle)
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"rows {len(s_rows)} vs {len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols {sorted(s_cols)} vs {sorted(d_cols)}")
        if not problems:
            hs, hd = table_hash(s_rows, s_cols), table_hash(d_rows, d_cols)
            if hs != hd:
                problems.append("value-hash mismatch")
                # show first differing line for debugging
                order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                ls = sorted("|".join(norm_cell(r[i]) for i in order_s) for r in s_rows)
                ld = sorted("|".join(norm_cell(r[i]) for i in order_d) for r in d_rows)
                for a, b in zip(ls, ld):
                    if a != b:
                        problems.append(f"  spark: {a}\n  duck : {b}")
                        break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            print(f"PASS {name} ({len(s_rows)} rows, spark {t1-t0:.1f}s)")
    print(f"\n{checked - len(failures)}/{checked} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
