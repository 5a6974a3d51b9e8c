"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 (or --sf) and
compares against the matching ``oracle_sql()`` via DuckDB:
row count, column-name set, and an order-insensitive canonical value
comparison (every cell stringified, rows sorted). Exact string equality is
the strongest local proxy for the driver's value-hash.

Usage: python tools/verify_correctness.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import math
import sys
import time

sys.path.insert(0, "/root/repo")


def canon_cell(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(bool(v)).lower()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def canon_rows(cols, rows) -> tuple[list[str], list[str]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    out = sorted("|".join(canon_cell(r[i]) for i in order) for r in rows)
    return sorted_cols, out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entry_mod
    from crawl4ai_llm_spark.session import get_spark

    spark = get_spark(app_name="verify_correctness")
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = args.names or list(queries)
    failures = []
    for name in names:
        t0 = time.time()
        try:
            df = queries[name](spark, args.sf)
            s_cols = df.columns
            s_rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"SKIP  {name}: no oracle (rows-only) — {len(s_rows)} rows, {time.time()-t0:.1f}s")
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            continue
        sc, sv = canon_rows(s_cols, s_rows)
        dc, dv = canon_rows(d_cols, d_rows)
        problems = []
        if sc != dc:
            problems.append(f"columns differ: spark={sc} duckdb={dc}")
        if len(sv) != len(dv):
            problems.append(f"row count: spark={len(sv)} duckdb={len(dv)}")
        if not problems and sv != dv:
            diff_s = [r for r in sv if r not in set(dv)][:3]
            diff_d = [r for r in dv if r not in set(sv)][:3]
            problems.append(f"values differ; spark-only={diff_s} duckdb-only={diff_d}")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: " + " | ".join(problems))
        else:
            print(f"OK    {name}: {len(sv)} rows match, {time.time()-t0:.1f}s")
    print(f"\n{len(names) - len(failures)}/{len(names)} queries match the oracle")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
