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
