"""Round-over-round bench table, sourced byte-for-byte from artifacts
(VERDICT r06 #3): reads the PRIOR round's BENCH_r{N}.json `parsed`
headline and the CURRENT tree's BENCH_detail_latest.json headline,
matches their bases (cold vs cold: run 0 of each — r07+ headlines carry
`cold_queries` explicitly; r06's accepted run WAS its cold single
pass), and prints the markdown table for BENCH.md. Every number in the
output greps in one of the two artifacts.

Usage: python tools/bench_round_table.py BENCH_r06.json
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def cold_view(headline: dict) -> tuple[float, dict, str]:
    """(total_sec, queries, basis_note) at the COLD basis."""
    if "cold_total_sec" in headline:  # r07+ artifact: explicit cold fields
        note = (
            f"accepted run {headline['accepted_run']} "
            f"({headline.get('accepted_basis', '?')}); cold fields quoted"
        )
        return headline["cold_total_sec"], headline["cold_queries"], note
    if headline.get("accepted_run") == 0:  # pre-r07: accepted == run 0 == cold
        return headline["value"], headline["queries"], "accepted run 0 (cold)"
    raise SystemExit(
        "prior artifact accepted a warm pass and carries no cold fields — "
        "quote its detail sidecar runs[0] by hand"
    )


def main() -> None:
    prev_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_r06.json"
    prev = json.load(open(os.path.join(REPO, prev_path)))["parsed"]
    cur = json.load(open(os.path.join(REPO, "BENCH_detail_latest.json")))["headline"]
    p_total, p_q, p_note = cold_view(prev)
    c_total, c_q, c_note = cold_view(cur)
    print(f"Basis: prior = {p_note}; current = {c_note}. Cold-for-cold.\n")
    print("| query | prior cold (s) | current cold (s) | Δ |")
    print("|---|---|---|---|")
    for name in sorted(set(p_q) | set(c_q)):
        a, b = p_q.get(name), c_q.get(name)
        if a is None or b is None:
            delta = "new" if a is None else "removed"
            print(f"| {name} | {a if a is not None else '—'} | {b if b is not None else '—'} | {delta} |")
        else:
            pct = 100.0 * (b - a) / a if a else 0.0
            print(f"| {name} | {a} | {b} | {pct:+.0f}% |")
    pct = 100.0 * (c_total - p_total) / p_total
    print(f"| **suite total** | **{p_total}** | **{c_total}** | **{pct:+.0f}%** |")
    print(
        f"\ncrawl urls/s: {prev.get('crawl_urls_per_sec')} → {cur.get('crawl_urls_per_sec')} "
        f"(in-run sys {prev.get('crawl_run_sys_frac')} → {cur.get('crawl_run_sys_frac')}); "
        f"ingest {prev.get('dedup_index_ingest_sec')} s → {cur.get('dedup_index_ingest_sec')} s "
        f"(fresh={cur.get('dedup_index_ingest_fresh')})"
    )


if __name__ == "__main__":
    main()
