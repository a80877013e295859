#!/usr/bin/env python3
"""Validate the build/probe split artifact (graft.ProbeIndexed output):
the numbers behind "build once, probe many" must be machine-checkable
round-over-round, not prose claims.

Usage: python3 tools/check_probe.py [probe_out.json]
Exit non-zero when the artifact is unusable or the scale claims it
exists to document do not hold in it:
  - probing a fixed batch must be much cheaper than building (the
    amortization claim);
  - appending a fixed batch must be much cheaper than rebuilding (the
    incremental-maintenance claim) — note the append still contains one
    corpus-proportional term (the exact centers recompute, reported
    separately as ivf_centers_refresh_sec);
  - the k-means quantizer must not be WORSE than the label-column
    quantizer at equal K (it exists because label cells measured worse).
"""
import json
import sys

REQUIRED = [
    "ivf_build_sec", "ivf_probe200_sec", "ivf_recall5_flat",
    "kmeans_build_sec", "ivf_recall5_kmeans",
    "ivf_append200_sec", "ivf_centers_refresh_sec",
    "ivf_append200_assigned_sec",
    "dedup_build_sec", "dedup_probe500_sec", "dedup_append500_sec",
]


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "probe_out.json"
    try:
        with open(path) as f:
            doc = json.loads(f.read().strip())
    except Exception as e:
        print(f"FAIL: {path} does not parse: {e}")
        return 2
    missing = [k for k in REQUIRED
               if not isinstance(doc.get(k), (int, float))]
    if missing:
        print(f"FAIL: missing/non-numeric fields: {missing}")
        return 2
    fails = []
    if doc["ivf_probe200_sec"] >= 0.5 * doc["ivf_build_sec"]:
        fails.append(
            f"ivf probe {doc['ivf_probe200_sec']:.2f}s not << build "
            f"{doc['ivf_build_sec']:.2f}s - amortization claim broken")
    if doc["ivf_append200_sec"] >= 0.8 * doc["ivf_build_sec"]:
        fails.append(
            f"ivf append {doc['ivf_append200_sec']:.2f}s not < rebuild "
            f"{doc['ivf_build_sec']:.2f}s - incremental claim broken")
    if doc["ivf_append200_assigned_sec"] >= 0.8 * doc["kmeans_build_sec"]:
        fails.append(
            f"assigned append {doc['ivf_append200_assigned_sec']:.2f}s "
            f"not < kmeans rebuild {doc['kmeans_build_sec']:.2f}s")
    if doc["dedup_probe500_sec"] >= 0.5 * doc["dedup_build_sec"]:
        fails.append(
            f"dedup probe {doc['dedup_probe500_sec']:.2f}s not << build "
            f"{doc['dedup_build_sec']:.2f}s")
    if doc["dedup_append500_sec"] >= 0.8 * doc["dedup_build_sec"]:
        fails.append(
            f"dedup append {doc['dedup_append500_sec']:.2f}s not < "
            f"rebuild {doc['dedup_build_sec']:.2f}s")
    # partitioned (banded) dedup layout, when measured: the probe must
    # amortize against its own build, and — since round 11 routes
    # appends through flat DELTA tables instead of a ~320-partition-dir
    # fan-out — the append must be cheap like the flat layout's and add
    # only a bounded handful of files (the small-file growth the delta
    # design exists to stop). Compaction folds the deltas back to at
    # most one file per non-empty partition dir (256 bp + 64 ib ceiling).
    if isinstance(doc.get("dedup_banded_probe500_sec"), (int, float)):
        if doc["dedup_banded_probe500_sec"] >= \
                0.5 * doc["dedup_banded_build_sec"]:
            fails.append(
                f"banded dedup probe {doc['dedup_banded_probe500_sec']:.2f}s "
                f"not << build {doc['dedup_banded_build_sec']:.2f}s")
        if doc["dedup_banded_append500_sec"] >= \
                0.8 * doc["dedup_banded_build_sec"]:
            fails.append(
                f"banded append {doc['dedup_banded_append500_sec']:.2f}s "
                f"not < rebuild {doc['dedup_banded_build_sec']:.2f}s")
    if isinstance(doc.get("dedup_banded_files_per_append"), (int, float)):
        if doc["dedup_banded_files_per_append"] > 20:
            fails.append(
                f"banded append added {doc['dedup_banded_files_per_append']} "
                "files - delta writes must stay bounded (<= 20)")
        if doc.get("dedup_banded_files_post_compact", 0) > 340:
            fails.append(
                f"post-compaction file count "
                f"{doc.get('dedup_banded_files_post_compact')} exceeds the "
                "one-file-per-partition-dir ceiling (320 = 256 bp + 64 ib; "
                "gate at 340 leaves slack for _SUCCESS-adjacent writer "
                "artifacts, not extra data files)")
    # terminal shard shuffle, when measured (round 11+; optional like
    # the banded rows so pre-round-11 artifacts stay checkable):
    # corpus-linear by DESIGN (the one deliberately full pass), so the
    # in-artifact claim is only that a single hash-shuffle pass over
    # the docs costs less than shingling the same docs (dedup_build) —
    # a violated bound means the shuffle picked up a non-shuffle term
    # (a global sort, a driver collect)
    if isinstance(doc.get("shard_shuffle64_sec"), (int, float)):
        if doc["shard_shuffle64_sec"] >= doc["dedup_build_sec"]:
            fails.append(
                f"shard shuffle {doc['shard_shuffle64_sec']:.2f}s not < "
                f"dedup build {doc['dedup_build_sec']:.2f}s over the same "
                "docs - a one-shuffle pass must undercut a shingle pass")
    # equal-K quantizer comparison: k-means exists because the label
    # column measured worse; allow a small tolerance for probe noise
    if doc["ivf_recall5_kmeans"] < doc["ivf_recall5_flat"] - 0.02:
        fails.append(
            f"kmeans recall {doc['ivf_recall5_kmeans']} below label-cell "
            f"recall {doc['ivf_recall5_flat']} - quantizer regression")
    # the auto (default) probe path: below the crossover it IS the flat
    # plan (recall must be identical); above it, it must not cost more
    # than flat (the 3.4x win is why the default exists) nor give up
    # recall beyond probe noise
    if "ivf_auto_engaged" in doc:
        if not doc["ivf_auto_engaged"]:
            if doc.get("ivf_recall5_auto") != doc.get("ivf_recall5_flat"):
                fails.append(
                    f"auto not engaged but recall differs from flat: "
                    f"{doc.get('ivf_recall5_auto')} vs "
                    f"{doc.get('ivf_recall5_flat')}")
        else:
            if doc["ivf_probe200_sec"] > 1.2 * doc["ivf_probe200_flat_sec"]:
                fails.append(
                    f"auto probe {doc['ivf_probe200_sec']:.2f}s slower "
                    f"than flat {doc['ivf_probe200_flat_sec']:.2f}s with "
                    f"two-level engaged")
            if doc.get("ivf_recall5_auto", 0) < \
                    doc.get("ivf_recall5_flat", 0) - 0.05:
                fails.append(
                    f"auto recall {doc.get('ivf_recall5_auto')} below "
                    f"flat {doc.get('ivf_recall5_flat')} - 0.05")
    if fails:
        for m in fails:
            print(f"FAIL: {m}")
        return 3
    print(f"OK: {path} - probe/build {doc['ivf_probe200_sec']:.2f}/"
          f"{doc['ivf_build_sec']:.2f}s, append(total/refresh/assigned) "
          f"{doc['ivf_append200_sec']:.2f}/{doc['ivf_centers_refresh_sec']:.2f}/"
          f"{doc['ivf_append200_assigned_sec']:.2f}s, recall@5 "
          f"label={doc['ivf_recall5_flat']} kmeans={doc['ivf_recall5_kmeans']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
