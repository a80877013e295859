#!/usr/bin/env python3
"""Validate a bench artifact before round close: the JSON line must parse,
carry per-query numbers, and self-identify as an uncontended capture.

Usage: python3 tools/check_bench.py [bench_out.json [previous_bench.json]]
Exit non-zero when the artifact is unusable (unparseable, empty, errored
queries) OR when the recorded loadavg / surviving rep spread marks the
capture as contended — round 5 shipped a bench captured under heavy VM
load showing a phantom 3-5x regression, and round 6's driver capture
repeated it; a contended run must never silently become the round
artifact, so these are FAIL paths, not warnings.

With a second argument (the previous round's committed capture), also
compares per-query times and flags >1.5x drift in either direction —
round 7's uniform ~1.3-1.5x environment shift had to be reconstructed
by hand because nothing diffed the captures; a drift report makes an
environment-shift round self-documenting (many queries drifting
together = machine state; one query alone = a plan change to explain).
Drift is a WARNING by default (exit 0): the signal distinguishes, it
does not adjudicate.
"""
import json
import os
import sys


def history_report(queries, sf, hist_path="bench_history.jsonl",
                   touched_ok=(), remeasure_path=None, capture_sha=None,
                   capture_tree=None, capture_build=None):
    """Run-LEVEL drift vs the capture history the bench appends: the
    in-run rep guard compares reps within one run and cannot see a run
    where a query is degraded in EVERY rep (round 9: dedup_containment
    read 5.49s min-of-2 in one capture vs 2.04s for the same HEAD in
    another). Compare this capture's per-query min against the best min
    over the recent history; >2x above best with an absolute floor is
    flagged.

    GATE (round 11 — previously warning-only): a flagged query FAILS the
    validator unless (a) a re-measure artifact (bench_remeasure.json, a
    bench JSON line from re-running JUST the flagged queries) shows it
    back under 2x its best recent min — the bounded re-measure that
    cleared dedup_containment by hand in round 10, now mechanical — or
    (b) it is named in --touched-ok=q1,q2 because a commit this round
    changed its code path, which puts the adjudication ON RECORD in the
    invocation instead of silently in the reader's head.
    Returns the list of unexplained degraded queries."""
    if not os.path.exists(hist_path):
        print(f"NOTE: no {hist_path} yet - history guard idle")
        return []
    runs = []
    with open(hist_path) as f:
        for ln in f:
            ln = ln.strip()
            if not ln:
                continue
            try:
                runs.append(json.loads(ln))
            except Exception:
                pass
    # same-SF runs only (cross-SF mins are not comparable); the last 10
    # keep the window recent
    recent = [r for r in runs if isinstance(r.get("queries"), dict)
              and (sf is None or r.get("sf") == sf)][-10:]
    if not recent:
        print(f"WARN: {hist_path} holds no parseable runs")
        return []
    print(f"HISTORY ({len(recent)} recent runs):")
    for r in recent:
        la = r.get("loadavg") or ["?"]
        print(f"  {r.get('ts','?')[:19]} sha={r.get('sha','?')} "
              f"total={r.get('total', 0):.1f}s loadavg={la[0]} "
              f"n={r.get('n_queries','?')}")
    best = {}
    for r in recent:
        for k, v in r["queries"].items():
            if isinstance(v, (int, float)):
                if k not in best or v < best[k]:
                    best[k] = v
    degraded = [(k, queries[k], best[k]) for k in sorted(queries)
                if k in best and isinstance(queries[k], (int, float))
                and queries[k] > 2.0 * best[k]
                and queries[k] - best[k] > 0.5]
    if not degraded:
        print("OK: no query >2x above its best recent-history min")
        return []
    print(f"DEGRADED: {len(degraded)} queries read >2x their best recent "
          f"min (run-level degradation or a touching commit):")
    for k, now, b in degraded:
        print(f"  {k}: best {b:.2f}s -> now {now:.2f}s ({now/b:.2f}x)")
    # (a) a bounded re-measure of the flagged queries clears them — but
    # the escape hatch must not outlive its round: a bench_remeasure.json
    # left on disk from a PREVIOUS round would silently convert the gate
    # back into a no-op for any query it names. Both artifacts stamp the
    # git sha they ran at (round 11+); a re-measure is honored only when
    # the shas match (modulo the +dirty suffix).
    remeasured = {}
    if remeasure_path and os.path.exists(remeasure_path):
        r_sha = r_tree = None
        try:
            with open(remeasure_path) as f:
                r_doc = json.loads(f.read().strip())
            remeasured = r_doc.get("queries") or {}
            r_sha = r_doc.get("sha")
            r_tree = r_doc.get("tree")
        except Exception as e:
            print(f"WARN: re-measure {remeasure_path} does not parse: {e}")

        def base(s):
            return (s or "").split("+", 1)[0]
        sha_match = (base(capture_sha) and base(capture_sha) != "unknown"
                     and base(capture_sha) == base(r_sha))
        # tree match (round 13): the driver's capture runs on a snapshot
        # commit stacked ON TOP of the committed close, so its commit sha
        # can never equal a committed re-measure's — but the git TREE
        # hash identifies the content itself. A tree match is honored
        # only when BOTH artifacts record a clean tree ("+dirty" taints
        # the hash: it describes HEAD, not the files that actually ran).
        def clean_tree(t):
            return t if t and "+" not in t and t != "unknown" else None
        tree_match = (clean_tree(capture_tree) is not None
                      and clean_tree(capture_tree) == clean_tree(r_tree))
        # build fingerprint (round 14): a src/main tree match is not
        # enough when the build CONFIG changed (build.sbt pins, project/
        # sbt + JVM flags also shape performance). When both artifacts
        # record a `build` field it must match too (clean, like the
        # tree); artifacts predating the field keep the old behavior.
        r_build = r_doc.get("build") if remeasured else None
        if (tree_match and r_build is not None
                and capture_build is not None
                and (clean_tree(capture_build) is None
                     or clean_tree(capture_build) != clean_tree(r_build))):
            print(f"WARN: tree match rejected: build fingerprint "
                  f"{r_build!r} != capture's {capture_build!r} "
                  "(re-measure ran under a different build config)")
            tree_match = False
        if not (sha_match or tree_match):
            if remeasured:
                print(f"WARN: ignoring {remeasure_path}: its sha {r_sha!r} "
                      f"/ tree {r_tree!r} matches neither the capture's "
                      f"sha {capture_sha!r} nor its clean tree "
                      f"{capture_tree!r} (stale re-measure from another "
                      "commit?)")
            remeasured = {}
        elif tree_match and not sha_match:
            print(f"NOTE: re-measure honored via tree match "
                  f"({clean_tree(r_tree)}) — same content, different "
                  "commit (snapshot stacking)")
    unexplained = []
    for k, now, b in degraded:
        if k in touched_ok:
            print(f"  {k}: accepted via --touched-ok (code path changed)")
        elif k in remeasured and isinstance(remeasured[k], (int, float)) \
                and (remeasured[k] <= 2.0 * b or remeasured[k] - b <= 0.5):
            print(f"  {k}: re-measure cleared it "
                  f"({remeasured[k]:.2f}s vs best {b:.2f}s)")
        else:
            unexplained.append(k)
    if unexplained:
        print(f"FAIL: {len(unexplained)} degraded queries unexplained: "
              f"{unexplained}")
        print("  re-measure them alone and point the validator at it:")
        print(f"  SPARK_GRAFT_BENCH_QUERIES={','.join(unexplained)} "
              "SPARK_GRAFT_BENCH_OUT=bench_remeasure.json "
              "SPARK_GRAFT_BENCH_HISTORY=/dev/null "
              "sbt 'runMain graft.Bench'")
        print("  or, if a commit changed their code path: "
              f"--touched-ok={','.join(unexplained)}")
    return unexplained


def drift_report(queries, prev_path):
    try:
        with open(prev_path) as f:
            prev = json.loads(f.read().strip()).get("queries") or {}
    except Exception as e:
        print(f"WARN: previous capture {prev_path} does not parse: {e}")
        return
    common = sorted(k for k in queries if k in prev
                    and isinstance(queries[k], (int, float))
                    and isinstance(prev[k], (int, float)) and prev[k] > 0)
    drifted = [(k, queries[k] / prev[k]) for k in common
               # absolute floor: a 0.05s->0.12s move is noise, not drift
               if (queries[k] / prev[k] > 1.5 or queries[k] / prev[k] < 1 / 1.5)
               and abs(queries[k] - prev[k]) > 0.3]
    if not common:
        print(f"WARN: no common queries with {prev_path}")
    elif not drifted:
        print(f"OK: no >1.5x per-query drift vs {prev_path} "
              f"({len(common)} common queries)")
    else:
        frac = len(drifted) / len(common)
        kind = ("uniform environment shift"
                if frac > 0.5 else "query-specific drift")
        print(f"WARN: {len(drifted)}/{len(common)} queries drifted >1.5x "
              f"vs {prev_path} ({kind}):")
        for k, r in sorted(drifted, key=lambda t: -t[1]):
            print(f"  {k}: {prev[k]:.2f}s -> {queries[k]:.2f}s ({r:.2f}x)")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    touched_ok = set()
    for a in sys.argv[1:]:
        if a.startswith("--touched-ok="):
            touched_ok |= {q for q in a.split("=", 1)[1].split(",") if q}
    path = args[0] if args else "bench_out.json"
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
    total = doc.get("value")
    if not isinstance(total, (int, float)):
        print(f"FAIL: {path} has no numeric total value: {total!r}")
        return 2
    fails = []
    load = doc.get("loadavg") or []
    # local[32] leaves ~0 background headroom: a 1-min load far above the
    # bench's own footprint at start means another workload shared the run
    if load and isinstance(load[0], (int, float)) and load[0] > 8.0:
        fails.append(f"loadavg at start was {load[0]} - contended capture")
    # a capture stamped "closing" PROMISED the idle standard (the bench
    # refuses to start above it in closing mode). The gate reads the
    # PRE-JVM sample the refusal itself evaluated (closing_load) when
    # recorded — loadavg[0] is taken after Spark init and can drift a
    # tenth or two — and holds it to the absolute 1.5 regardless of any
    # SPARK_GRAFT_BENCH_MAX_LOAD override: a raised threshold must not
    # launder a contended closing capture through validation.
    if doc.get("closing"):
        gate_load = doc.get("closing_load")
        if not isinstance(gate_load, (int, float)):
            gate_load = load[0] if load and \
                isinstance(load[0], (int, float)) else None
        if gate_load is not None and gate_load > 1.5:
            fails.append(f"closing capture recorded start loadavg "
                         f"{gate_load} > 1.5 - the closing refusal was "
                         "bypassed or overridden")
        # the -1 sentinel: the load sample failed, so idleness was never
        # verified — a closing artifact cannot claim the standard
        if gate_load is None or gate_load < 0:
            fails.append("closing capture has no verifiable load sample "
                         f"(closing_load={gate_load!r})")
    spread = doc.get("spread") or {}
    # spread is [min, second_fastest, max, n] (round 7+) or the legacy
    # [min, max, n]. The surviving-contention signal is the two FASTEST
    # reps still disagreeing >2x after the bench's own bounded retries;
    # for legacy artifacts fall back to the >3x max/min heuristic.
    wild = []
    for k, v in spread.items():
        if not v:
            continue
        if len(v) == 4:
            mn, s2, _mx, n = v
            if n >= 2 and s2 > 2.0 * mn and s2 - mn > 0.5:
                wild.append(k)
        elif len(v) == 3:
            mn, mx, n = v
            if n >= 2 and mx > 3.0 * mn and mx - mn > 1.0:
                wild.append(k)
    if wild:
        fails.append(f"two fastest reps disagree >2x even after retries: "
                     f"{sorted(wild)}")
    if fails:
        for msg in fails:
            print(f"FAIL: {msg}")
        return 3
    print(f"OK: {path} parses, {len(queries)} queries, total {total:.1f}s")
    # The one sentence a commit message may claim about this capture —
    # derived ONLY from artifact fields, so the claim and the committed
    # file can never disagree (round 8 committed "loadavg 0.28" beside an
    # artifact recording [1.1, 2.16]). Copy it verbatim.
    load_s = ("loadavg [" + ", ".join(f"{x:.2f}" for x in load) + "]"
              if load else "loadavg unrecorded")
    print(f"COMMIT-LINE: bench capture ({total:.1f}s / {len(queries)} "
          f"queries, {load_s})")
    if len(args) > 1:
        drift_report(queries, args[1])
    # the history lives where the bench wrote it: honor the same env
    # override the bench honors, else look beside the bench artifact
    bench_dir = os.path.dirname(os.path.abspath(path)) or "."
    unexplained = history_report(
        queries, doc.get("sf"),
        os.environ.get("SPARK_GRAFT_BENCH_HISTORY") or
        os.path.join(bench_dir, "bench_history.jsonl"),
        touched_ok=touched_ok,
        remeasure_path=os.environ.get("SPARK_GRAFT_BENCH_REMEASURE") or
        os.path.join(bench_dir, "bench_remeasure.json"),
        capture_sha=doc.get("sha"), capture_tree=doc.get("tree"),
        capture_build=doc.get("build"))
    return 4 if unexplained else 0


if __name__ == "__main__":
    sys.exit(main())
