#!/usr/bin/env bash
# Round-close bench protocol, MECHANIZED (round-15 verdict task 1b: the
# bench-evidence gate failed two rounds running on protocol slips —
# contended captures committed as the round artifact, stale re-measures
# left clearing nothing). This script makes the slip impossible instead
# of adjudicated after the fact: it refuses to stamp the close commit
# while tools/check_bench.py exits non-zero.
#
# What it does, in order:
#   1. refuses to run while src/main / build config is dirty (the
#      capture must describe committed code — a +dirty tree hash can
#      never be honored by check_bench's tree match);
#   2. runs the CLOSING capture (SPARK_GRAFT_BENCH_CLOSING=1 — Bench
#      itself refuses to start above loadavg 1.5, so a contended close
#      cannot even begin);
#   3. runs check_bench; if (and only if) it flags degraded queries, it
#      re-measures EXACTLY those queries with the command check_bench
#      prints (bench_remeasure.json, history suppressed) and validates
#      again — the tree-matched re-measure the round-15 verdict asked
#      for, produced mechanically on the closing tree;
#   4. commits bench_out.json (+ bench_remeasure.json when produced) and
#      bench_history.jsonl ONLY after check_bench exits 0. Any earlier
#      failure exits non-zero with nothing committed.
#
# Usage: tools/close_round.sh            (from anywhere inside the repo)
#   SPARK_GRAFT_SF_DIR overrides the bench scale dir (default sf0.1).
set -euo pipefail
cd "$(git rev-parse --show-toplevel)"

if [ -n "$(git status --porcelain src/main build.sbt project)" ]; then
  echo "close_round: src/main or build config dirty - commit first" >&2
  echo "             (a +dirty tree taints the capture's tree hash)" >&2
  exit 1
fi

export SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
echo "close_round: closing capture on $(git rev-parse --short HEAD) at $SPARK_GRAFT_SF_DIR"
SPARK_GRAFT_BENCH_CLOSING=1 sbt -batch 'runMain graft.Bench'

check() { python3 tools/check_bench.py bench_out.json; }

out="$(mktemp)"
remeasured=0
if ! check | tee "$out"; then
  # extract the exact re-measure query list check_bench printed; any
  # other failure mode (contended capture, parse error) has no
  # mechanical remedy - fix the cause and re-run
  qlist="$(sed -n 's/.*SPARK_GRAFT_BENCH_QUERIES=\([^ ]*\) .*/\1/p' "$out" | head -1)"
  if [ -z "$qlist" ]; then
    echo "close_round: check_bench failed without a re-measure remedy - fix the cause and re-run" >&2
    rm -f "$out"; exit 2
  fi
  echo "close_round: re-measuring flagged queries: $qlist"
  SPARK_GRAFT_BENCH_QUERIES="$qlist" \
    SPARK_GRAFT_BENCH_OUT=bench_remeasure.json \
    SPARK_GRAFT_BENCH_HISTORY=/dev/null \
    SPARK_GRAFT_BENCH_CLOSING=1 sbt -batch 'runMain graft.Bench'
  remeasured=1
  if ! check; then
    echo "close_round: check_bench STILL fails after the re-measure - a real regression; not committing" >&2
    rm -f "$out"; exit 3
  fi
fi
rm -f "$out"

# only a re-measure PRODUCED BY THIS RUN is committed: an old one on
# disk describes another tree and must not be re-stamped into the close
git add bench_out.json bench_history.jsonl
[ "$remeasured" = 1 ] && git add bench_remeasure.json
line="$(python3 tools/check_bench.py bench_out.json | sed -n 's/^COMMIT-LINE: //p')"
git commit -m "round close: ${line:-idle closing bench capture} (check_bench exit 0)"
echo "close_round: committed with a green bench gate"
