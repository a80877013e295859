#!/usr/bin/env python3
"""Validate a bench artifact before round close: the JSON line must parse,
carry per-query numbers, and self-identify as an uncontended capture.

Usage: python3 tools/check_bench.py [bench_out.json]
Exit non-zero when the artifact is unusable (unparseable, empty, errored
queries) and print a WARNING (exit 0) when the recorded loadavg or rep
spread suggests contention — round 5 shipped a bench captured under heavy
VM load showing a phantom 3-5x regression, which this check would have
flagged.
"""
import json
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "bench_out.json"
    try:
        with open(path) as f:
            doc = json.loads(f.read().strip())
    except Exception as e:
        print(f"FAIL: {path} does not parse: {e}")
        return 2
    queries = doc.get("queries") or {}
    if not queries:
        print(f"FAIL: {path} has no queries")
        return 2
    missing = sorted(k for k, v in queries.items() if v is None)
    if missing:
        print(f"FAIL: {len(missing)} queries with no successful rep: {missing}")
        return 2
    if doc.get("errors"):
        print(f"FAIL: errored queries: {doc['errors']}")
        return 2
    warns = []
    load = doc.get("loadavg") or []
    # local[32] leaves ~0 background headroom: a 1-min load far above the
    # bench's own footprint at start means another workload shared the run
    if load and load[0] > 8.0:
        warns.append(f"loadavg at start was {load[0]} - contended capture?")
    spread = doc.get("spread") or {}
    wild = sorted(k for k, v in spread.items()
                  if v and v[2] >= 2 and v[1] > 3.0 * v[0] and v[1] - v[0] > 1.0)
    if wild:
        warns.append(f"reps disagree >3x even after retries: {wild}")
    for w in warns:
        print(f"WARN: {w}")
    n = len(queries)
    print(f"OK: {path} parses, {n} queries, total {doc.get('value'):.1f}s"
          + (" (with warnings)" if warns else ""))
    return 0


if __name__ == "__main__":
    sys.exit(main())
