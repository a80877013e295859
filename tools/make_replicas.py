#!/usr/bin/env python3
"""Build the N-replica scale-probe dataset (PLANS.md 'replica rules'):
replicas are genuinely distinct — ids/users shifted per replica, document
text gets a per-replica word prefix — and written with pyarrow so the
events TIMESTAMP(NANOS) physical type survives (DuckDB would silently
downcast to micros, changing what Spark reads).

Usage: python3 tools/make_replicas.py <srcSfDir> <outDir> [n=10]
Only the tables the probed queries touch are replicated; the rest are
symlinked from the source dir so every contract query still resolves.
"""
import os, sys
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def replicate_events(src, out, n):
    t = pq.read_table(f"{src}/events.parquet")
    parts = []
    for i in range(n):
        parts.append(pa.table({
            "event_id": pc.add(t["event_id"], i * 10_000_000),
            "ts": t["ts"],
            # shift must exceed the source user span (0..1499 at sf0.1) or
            # consecutive replicas' user bands overlap
            "user_id": pc.add(t["user_id"], i * 10_000),
            "event_type": t["event_type"],
            "value": t["value"],
            "props": t["props"],
        }, schema=t.schema))
    pq.write_table(pa.concat_tables(parts), f"{out}/events.parquet")


def replicate_documents(src, out, n):
    t = pq.read_table(f"{src}/documents.parquet")
    parts = []
    for i in range(n):
        # EVERY word gets the replica prefix (not just the first): a
        # single-token prefix leaves deeper shingles identical across
        # replicas, turning every doc into 9 cross-replica near-dups —
        # pair workloads then grow ~45x instead of 10x and the probe
        # measures a different corpus shape, not scale-up.
        # The 'x' terminator makes the prefix self-delimiting (digits
        # can't contain 'x'), so r1 + word '0abc' can never collide with
        # r10 + word 'abc' when n >= 11.
        pre = f"r{i}x"
        text = pc.binary_join_element_wise(
            pre, pc.replace_substring(t["text"], " ", f" {pre}"), "")
        parts.append(pa.table({
            "doc_id": pc.add(t["doc_id"], i * 1_000_000),
            "text": text,
            "lang": t["lang"],
            "source": t["source"],
            "n_chars": pc.utf8_length(text),
        }, schema=t.schema))
    pq.write_table(pa.concat_tables(parts), f"{out}/documents.parquet")


def replicate_embeddings(src, out, n):
    import numpy as np
    t = pq.read_table(f"{src}/embeddings.parquet")
    emb = np.array(t["embedding"].to_pylist(), dtype=np.float32)
    parts = []
    for i in range(n):
        # rotate dims per replica: norms and within-replica pairwise
        # cosines are EXACTLY preserved (dot is invariant under a common
        # permutation), so each replica is the same workload on distinct
        # vectors. Labels shift per replica — the quantizer's cell count
        # scales K ∝ n with the corpus (SemDeDup's scaling contract;
        # within-cell pair volume stays constant per replica instead of
        # growing quadratically under a fixed K).
        rolled = np.roll(emb, i, axis=1)
        parts.append(pa.table({
            "vec_id": pc.add(t["vec_id"], i * 1_000_000),
            "embedding": pa.array(rolled.tolist(),
                                  type=t.schema.field("embedding").type),
            "label": pc.add(t["label"], pa.scalar(i * 1000, pa.int32())),
        }, schema=t.schema))
    pq.write_table(pa.concat_tables(parts), f"{out}/embeddings.parquet")


def main():
    # symlink targets resolve relative to the LINK dir, not the caller's
    # cwd — absolutize so a relative srcSfDir doesn't produce broken links
    src = os.path.abspath(sys.argv[1].rstrip("/"))
    out = sys.argv[2].rstrip("/")
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)
    replicate_events(src, out, n)
    replicate_documents(src, out, n)
    replicate_embeddings(src, out, n)
    for tbl in TABLES:
        dst = f"{out}/{tbl}.parquet"
        if not os.path.exists(dst):
            target = f"{src}/{tbl}.parquet"
            assert os.path.exists(target), f"missing source table {target}"
            os.symlink(target, dst)
    print(f"wrote {out}: events+documents x{n}, rest symlinked from {src}")


if __name__ == "__main__":
    main()
