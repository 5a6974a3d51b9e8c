"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 (or --sf) and
compares against the matching ``oracle_sql()`` via DuckDB:
row count, column-name set, an order-insensitive canonical value
comparison (every cell stringified, rows sorted), AND a physical Arrow
type comparison per column. The driver's value-hash operates on Arrow
data, so a DuckDB HUGEINT (decimal128) vs Spark int64 mismatch fails the
driver even when the stringified values are identical — the type check
catches that class locally (found the hard way in round 1: q_events_json).

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


def canon_arrow_type(t) -> str:
    """Canonical label for an Arrow type, collapsing representation-only
    differences (string vs large_string, list vs large_list) but preserving
    everything the driver's value-hash can see: integer width/signedness,
    float width, decimal precision/scale, timestamp unit."""
    import pyarrow as pa

    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return f"list<{canon_arrow_type(t.value_type)}>"
    if pa.types.is_timestamp(t):
        return f"timestamp[{t.unit}]"  # ignore tz: session tz is UTC both sides
    return str(t)


def arrow_type_mismatches(s_tbl, d_tbl) -> list[str]:
    s_types = {f.name: canon_arrow_type(f.type) for f in s_tbl.schema}
    d_types = {f.name: canon_arrow_type(f.type) for f in d_tbl.schema}
    out = []
    for name in sorted(set(s_types) & set(d_types)):
        if s_types[name] != d_types[name]:
            out.append(f"{name}: spark={s_types[name]} duckdb={d_types[name]}")
    return out


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
            s_tbl = df.toArrow()
            s_rows = [tuple(r.values()) for r in s_tbl.to_pylist()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"SKIP  {name}: no oracle (rows-only) — {len(s_rows)} rows, {time.time()-t0:.1f}s")
            continue
        try:
            res = con.execute(oracles[name])
            d_tbl = res.arrow()
            d_cols = d_tbl.column_names
            d_rows = [tuple(r.values()) for r in d_tbl.to_pylist()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            continue
        sc, sv = canon_rows(s_cols, s_rows)
        dc, dv = canon_rows(d_cols, d_rows)
        problems = []
        type_diffs = arrow_type_mismatches(s_tbl, d_tbl)
        if type_diffs:
            problems.append("arrow types differ: " + "; ".join(type_diffs))
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
