#!/usr/bin/env bash
# One-command per-round artifact refresh — bench, scale smoke, README
# render, all from the same tree state, so the committed numbers can
# never drift from each other (VERDICT r7 item 4 root cause was the
# manual multi-step process).
#
# Usage: scripts/round_artifacts.sh <round>      e.g. scripts/round_artifacts.sh 8
#
# Produces BENCH_r0<round>_local.json + BENCH_r0<round>_sf1.json and
# rewrites README.md's generated block. Run on a QUIET box (1-min
# load < 1 — concurrent work skews both engines unevenly) and commit
# the three files together.

set -euo pipefail
cd "$(dirname "$0")/.."

ROUND="${1:?usage: round_artifacts.sh <round-number>}"
TAG=$(printf "r%02d" "$ROUND")

LOAD=$(awk '{print int($1)}' /proc/loadavg)
if [ "$LOAD" -ge 2 ]; then
  echo "load average $(cut -d' ' -f1 /proc/loadavg) — let the box quiesce first" >&2
  exit 1
fi

echo "== bench (sf0.1) ==" >&2
python bench.py > /tmp/bench_stdout_$$.txt
cp bench_full_latest.json "BENCH_${TAG}_local.json"

echo "== scale smoke (sf1) ==" >&2
python scripts/scale_smoke.py > "BENCH_${TAG}_sf1.json"

echo "== README render ==" >&2
python scripts/render_readme_bench.py

echo "artifacts: BENCH_${TAG}_local.json BENCH_${TAG}_sf1.json README.md" >&2
tail -1 /tmp/bench_stdout_$$.txt
rm -f /tmp/bench_stdout_$$.txt

# Machine-derived verdict summary + note-vs-artifact consistency
# assertion (VERDICT r10 item 1: r9 AND r10 both shipped notes
# claiming "over_2x empty" while a per-query flag in the committed
# record was true). This block (a) prints the summary to copy into
# BENCH_NOTES verbatim, (b) FAILS if any BENCH_NOTES line mentioning
# this round's tag claims an empty over_2x while the artifact
# disagrees.
python - "$TAG" <<'PYEOF'
import json, re, sys

tag = sys.argv[1]
rec = json.load(open(f"BENCH_{tag}_local.json"))
pq = rec.get("vs_duckdb_per_query", {})
flagged = sorted(k for k, v in pq.items() if v.get("over_2x"))
borderline = sorted(
    k for k, v in pq.items() if v.get("over_2x") and v.get("borderline")
)
print(f"== verdict summary ({tag}) — copy THIS into BENCH_NOTES ==")
if not flagged:
    print("over_2x: empty")
else:
    for k in flagged:
        v = pq[k]
        adj = " [borderline: noise decides]" if v.get("borderline") else ""
        print(
            f"over_2x: {k} floor_adj {v['floor_adj_ratio']} "
            f"margin {v['margin_sec']:+.3f}s{adj}"
        )
print(f"loadavg_1min: {rec.get('loadavg_1min')}")

if flagged:
    try:
        notes = open("docs/BENCH_NOTES.md").read()
    except OSError:
        notes = ""
    bad = [
        ln for ln in notes.splitlines()
        if tag in ln and re.search(r"over_2x[^.]{0,40}\bempty\b", ln)
    ]
    if bad:
        print(
            f"CONSISTENCY FAILURE: BENCH_{tag}_local.json flags "
            f"{flagged} over_2x but docs/BENCH_NOTES.md claims empty:\n  "
            + "\n  ".join(bad),
            file=sys.stderr,
        )
        sys.exit(1)
PYEOF
