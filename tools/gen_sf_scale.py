#!/usr/bin/env python3
"""sf1 rehearsal fixture generator (VERDICT r9 'What's wrong' item 1).

Scales the driver's sf0.1 fixtures 10x into a local rehearsal dir by
replicating each table with shifted keys, preserving every FK
relationship within each copy (nation/region stay fixed, like TPC-H).
Text and embeddings are deterministically perturbed per copy so the
corpus keeps sf0.1's duplicate/near-dup rate instead of becoming 90%
exact copies (which no driver-generated sf1 would look like):

  - documents: words shuffled with rng seeded by (copy, doc_id); n_chars
    recomputed from the shuffled text.
  - embeddings: seeded uniform noise then re-normalized to unit length.

Run:  python3 tools/gen_sf_scale.py [outdir] [copies]
Default outdir /root/repo/sf1-rehearsal (gitignored), copies=10.
"""
import os
import random
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/sf1-rehearsal"
COPIES = int(sys.argv[2]) if len(sys.argv) > 2 else 10

# key -> per-copy offset (sf0.1 keys are dense 0..N-1)
OFFSETS = {
    "c_custkey": 15000, "s_suppkey": 1000, "p_partkey": 20000,
    "o_orderkey": 150000, "o_custkey": 15000,
    "l_orderkey": 150000, "l_partkey": 20000, "l_suppkey": 1000,
    "event_id": 100000, "user_id": 1500,
    "doc_id": 5000, "vec_id": 2000,
}


def scale_sql(table: str) -> None:
    con = duckdb.connect()
    cols = [c[0] for c in con.execute(
        f"DESCRIBE SELECT * FROM '{SRC}/{table}.parquet'").fetchall()]
    parts = []
    for i in range(COPIES):
        sel = ", ".join(
            f"{c} + {i * OFFSETS[c]} AS {c}" if c in OFFSETS else c
            for c in cols)
        parts.append(f"SELECT {sel} FROM '{SRC}/{table}.parquet'")
    union = " UNION ALL ".join(parts)
    con.execute(f"COPY ({union}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
    print(f"  {table}: x{COPIES}")


def scale_documents() -> None:
    t = pq.read_table(f"{SRC}/documents.parquet")
    doc_id = t.column("doc_id").to_pylist()
    text = t.column("text").to_pylist()
    lang = t.column("lang").to_pylist()
    source = t.column("source").to_pylist()
    ids, txts, langs, srcs, nchars = [], [], [], [], []
    for i in range(COPIES):
        for j in range(len(doc_id)):
            ids.append(doc_id[j] + i * OFFSETS["doc_id"])
            if i == 0:
                s = text[j]
            else:
                words = text[j].split(" ")
                random.Random(1_000_003 * i + doc_id[j]).shuffle(words)
                s = " ".join(words)
            txts.append(s)
            langs.append(lang[j])
            srcs.append(source[j])
            nchars.append(len(s))
    out = pa.table({
        "doc_id": pa.array(ids, pa.int64()), "text": pa.array(txts, pa.string()),
        "lang": pa.array(langs, pa.string()), "source": pa.array(srcs, pa.string()),
        "n_chars": pa.array(nchars, pa.int64())})
    pq.write_table(out, f"{OUT}/documents.parquet")
    print(f"  documents: x{COPIES} (word-shuffled per copy)")


def scale_embeddings() -> None:
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    vec_id = t.column("vec_id").to_pylist()
    emb = t.column("embedding").to_pylist()
    label = t.column("label").to_pylist()
    ids, vecs, labels = [], [], []
    for i in range(COPIES):
        for j in range(len(vec_id)):
            ids.append(vec_id[j] + i * OFFSETS["vec_id"])
            v = emb[j]
            if i > 0:
                rng = random.Random(7_000_003 * i + vec_id[j])
                v = [x + rng.uniform(-0.05, 0.05) for x in v]
                norm = sum(x * x for x in v) ** 0.5
                v = [x / norm for x in v]
            vecs.append([float(x) for x in v])
            labels.append(label[j])
    out = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32())})
    pq.write_table(out, f"{OUT}/embeddings.parquet")
    print(f"  embeddings: x{COPIES} (noised + renormalized per copy)")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for table in ["region", "nation"]:  # fixed dims, copied verbatim
        duckdb.sql(
            f"COPY (SELECT * FROM '{SRC}/{table}.parquet') "
            f"TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
        print(f"  {table}: verbatim")
    for table in ["customer", "supplier", "part", "orders", "lineitem", "events"]:
        scale_sql(table)
    scale_documents()
    scale_embeddings()
    print(f"done -> {OUT}")


if __name__ == "__main__":
    main()
