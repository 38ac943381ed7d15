#!/usr/bin/env python
"""Diff two bench.py JSON artifacts query by query.

Usage:
    python scripts/bench_compare.py BENCH_r04.json BENCH_r05.json

Prints cold/warm per-query deltas (absolute and %), the twin ratios
when present, and the headline totals — the comparison the round
verdict performs by hand.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    """Accept either a pretty-printed artifact (the driver's BENCH_r*
    files) or bench.py's raw one-JSON-line stdout capture."""
    with open(path) as fh:
        raw = fh.read().strip()
    try:
        d = json.loads(raw)
    except json.JSONDecodeError:
        d = json.loads(raw.splitlines()[-1])
    # the driver's BENCH_r*.json wraps bench.py's line under "parsed"
    if "queries" not in d and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    return d


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    a, b = load(sys.argv[1]), load(sys.argv[2])

    def section(title: str, ka: dict, kb: dict) -> None:
        names = sorted(set(ka) | set(kb))
        if not names:
            return
        print(f"\n{title}")
        print(f"{'query':<28} {'old':>8} {'new':>8} {'delta':>8} {'%':>7}")
        for n in names:
            va, vb = ka.get(n), kb.get(n)
            if va is None or vb is None:
                print(f"{n:<28} {va if va is not None else '-':>8} "
                      f"{vb if vb is not None else '-':>8} {'new' if va is None else 'gone':>8}")
                continue
            d = vb - va
            pct = (d / va * 100) if va else float("inf")
            print(f"{n:<28} {va:>8.3f} {vb:>8.3f} {d:>+8.3f} {pct:>+6.1f}%")

    section("cold (queries)", a.get("queries", {}), b.get("queries", {}))
    section("warm (queries_warm)", a.get("queries_warm", {}), b.get("queries_warm", {}))
    tw_a, tw_b = a.get("duckdb_twin_sec") or {}, b.get("duckdb_twin_sec") or {}
    if tw_b:
        section("duckdb twins", tw_a, tw_b)
    print("\ntotals")
    for key in ("value", "warm_total", "extended_total",
                "pipeline_records_per_sec", "vs_duckdb_ratio"):
        va, vb = a.get(key), b.get(key)
        if va is None and vb is None:
            continue
        print(f"  {key}: {va} -> {vb}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
