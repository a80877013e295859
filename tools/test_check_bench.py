#!/usr/bin/env python3
"""Self-test for check_bench's cross-run gate (round 11): a synthetic
degraded capture must FAIL (exit 4) unless a re-measure artifact clears
the flagged query or --touched-ok records a code-path change. Run from
the repo root: python3 tools/test_check_bench.py"""
import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))


def run(capture_dir, *extra, env_extra=None):
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_BENCH_HISTORY", None)
    env.pop("SPARK_GRAFT_BENCH_REMEASURE", None)
    if env_extra:
        env.update(env_extra)
    p = subprocess.run(
        [sys.executable, os.path.join(HERE, "check_bench.py"),
         os.path.join(capture_dir, "bench_out.json"), *extra],
        capture_output=True, text=True, env=env)
    return p.returncode, p.stdout + p.stderr


def write(capture_dir, queries, history_runs, remeasure=None,
          sha="abc1234", remeasure_sha="abc1234", closing=None,
          loadavg=(0.5, 0.5, 0.5), tree=None, remeasure_tree=None):
    doc = {"metric": "total", "value": sum(queries.values()), "unit": "sec",
           "queries": queries, "sf": "sfX", "loadavg": list(loadavg),
           "spread": {}, "errors": [], "sha": sha}
    if tree is not None:
        doc["tree"] = tree
    if closing is not None:
        doc["closing"] = closing
    with open(os.path.join(capture_dir, "bench_out.json"), "w") as f:
        f.write(json.dumps(doc) + "\n")
    with open(os.path.join(capture_dir, "bench_history.jsonl"), "w") as f:
        for qs in history_runs:
            f.write(json.dumps({"queries": qs, "sf": "sfX",
                                "total": sum(qs.values())}) + "\n")
    rp = os.path.join(capture_dir, "bench_remeasure.json")
    if remeasure is not None:
        rdoc = {"queries": remeasure}
        if remeasure_sha is not None:
            rdoc["sha"] = remeasure_sha
        if remeasure_tree is not None:
            rdoc["tree"] = remeasure_tree
        with open(rp, "w") as f:
            f.write(json.dumps(rdoc) + "\n")
    elif os.path.exists(rp):
        os.remove(rp)


def main():
    fails = 0

    def check(name, got, want):
        nonlocal fails
        ok = got == want
        print(f"{'PASS' if ok else 'FAIL'}: {name} (exit {got}, want {want})")
        if not ok:
            fails += 1

    with tempfile.TemporaryDirectory() as d:
        hist = [{"q1": 1.0, "q2": 0.2}, {"q1": 1.1, "q2": 0.25}]

        # healthy capture → 0
        write(d, {"q1": 1.2, "q2": 0.22}, hist)
        rc, _ = run(d)
        check("healthy capture passes", rc, 0)

        # q1 at 3x its best recent min → gate fires
        write(d, {"q1": 3.0, "q2": 0.22}, hist)
        rc, out = run(d)
        check("degraded capture fails", rc, 4)
        if "q1" not in out or "unexplained" not in out:
            fails += 1
            print("FAIL: degraded output must name the query")

        # a re-measure back under 2x best clears it → 0
        write(d, {"q1": 3.0, "q2": 0.22}, hist, remeasure={"q1": 1.3})
        rc, _ = run(d)
        check("clearing re-measure passes", rc, 0)

        # a re-measure still degraded does NOT clear it → 4
        write(d, {"q1": 3.0, "q2": 0.22}, hist, remeasure={"q1": 2.9})
        rc, _ = run(d)
        check("non-clearing re-measure still fails", rc, 4)

        # a STALE re-measure (written at another commit) must be ignored
        # even when its numbers would clear the query → 4
        write(d, {"q1": 3.0, "q2": 0.22}, hist, remeasure={"q1": 1.3},
              remeasure_sha="fff9999")
        rc, out = run(d)
        check("stale re-measure (sha mismatch) still fails", rc, 4)
        if "ignoring" not in out:
            fails += 1
            print("FAIL: stale re-measure must be reported as ignored")

        # a sha-less re-measure (pre-round-11 format) is not trusted → 4
        write(d, {"q1": 3.0, "q2": 0.22}, hist, remeasure={"q1": 1.3},
              remeasure_sha=None)
        rc, _ = run(d)
        check("sha-less re-measure still fails", rc, 4)

        # a dirty-tree re-measure at the same base commit clears → 0
        write(d, {"q1": 3.0, "q2": 0.22}, hist, remeasure={"q1": 1.3},
              remeasure_sha="abc1234+dirty")
        rc, _ = run(d)
        check("same-base dirty re-measure passes", rc, 0)

        # TREE matching (round 13): the driver's per-round capture runs
        # on a snapshot commit stacked on the committed close, so its
        # commit sha never matches a committed re-measure's — the git
        # tree hash of identical content does. A contended driver-style
        # capture (sha mismatch, clean tree match) clears via the
        # committed close-time re-measure → 0
        write(d, {"q1": 3.0, "q2": 0.22}, hist, remeasure={"q1": 1.3},
              sha="ddd0001", tree="tree555",
              remeasure_sha="abc1234", remeasure_tree="tree555")
        rc, out = run(d)
        check("sha-mismatched capture clears via clean tree match", rc, 0)
        if "tree match" not in out:
            fails += 1
            print("FAIL: tree-match clearing must be reported as such")

        # a DIRTY tree hash describes HEAD, not the files that ran —
        # it must not match in either direction → 4
        write(d, {"q1": 3.0, "q2": 0.22}, hist, remeasure={"q1": 1.3},
              sha="ddd0001", tree="tree555",
              remeasure_sha="abc1234", remeasure_tree="tree555+dirty")
        rc, _ = run(d)
        check("dirty re-measure tree does not match", rc, 4)
        write(d, {"q1": 3.0, "q2": 0.22}, hist, remeasure={"q1": 1.3},
              sha="ddd0001", tree="tree555+dirty",
              remeasure_sha="abc1234", remeasure_tree="tree555")
        rc, _ = run(d)
        check("dirty capture tree does not match", rc, 4)

        # different trees stay stale even with both recorded → 4
        write(d, {"q1": 3.0, "q2": 0.22}, hist, remeasure={"q1": 1.3},
              sha="ddd0001", tree="tree555",
              remeasure_sha="abc1234", remeasure_tree="tree999")
        rc, _ = run(d)
        check("tree mismatch still fails", rc, 4)

        # --touched-ok records the code-path adjudication → 0
        write(d, {"q1": 3.0, "q2": 0.22}, hist)
        rc, _ = run(d, "--touched-ok=q1")
        check("touched-ok passes", rc, 0)

        # small absolute moves stay under the floor → 0
        write(d, {"q1": 1.0, "q2": 0.55}, hist)
        rc, _ = run(d)
        check("sub-floor move passes", rc, 0)

        # a CLOSING capture recording a start load above the idle
        # threshold means the bench's refusal was bypassed → 3
        write(d, {"q1": 1.2, "q2": 0.22}, hist, closing=True,
              loadavg=(3.9, 4.2, 4.0))
        rc, out = run(d)
        check("closing capture above idle threshold fails", rc, 3)
        if "bypassed" not in out:
            fails += 1
            print("FAIL: closing-load failure must say the refusal was "
                  "bypassed")

        # the same load on a NON-closing (driver) capture stays under the
        # contended ceiling → 0 (the driver runs under load it can't help)
        write(d, {"q1": 1.2, "q2": 0.22}, hist, closing=False,
              loadavg=(3.9, 4.2, 4.0))
        rc, _ = run(d)
        check("non-closing capture at the same load passes", rc, 0)

        # a closing capture under the threshold passes → 0
        write(d, {"q1": 1.2, "q2": 0.22}, hist, closing=True,
              loadavg=(0.4, 0.5, 0.5))
        rc, _ = run(d)
        check("idle closing capture passes", rc, 0)

        # the -1 load sentinel (sample failed): idleness was never
        # verified, so a closing capture cannot claim the standard → 3
        write(d, {"q1": 1.2, "q2": 0.22}, hist, closing=True,
              loadavg=(-1.0, -1.0, -1.0))
        rc, out = run(d)
        check("unverifiable closing load fails", rc, 3)
        if "verifiable" not in out:
            fails += 1
            print("FAIL: sentinel failure must say the load was "
                  "unverifiable")

    print(f"== {'ALL PASS' if fails == 0 else f'{fails} FAILURES'}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
