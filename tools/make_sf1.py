#!/usr/bin/env python3
"""Generate a 10x scale-rehearsal dataset (sf1) from the read-only sf0.1
testdata, into /tmp/graft_sf1 (never into /root/testdata).

Method: key-shifted replication — each replica r shifts every key column by
r * unit so joins stay consistent and key cardinalities scale 10x, while all
value distributions stay EXACTLY the sf0.1 ones. pyarrow is used (not
duckdb) so physical parquet types survive byte-for-byte — notably events.ts
TIMESTAMP(NANOS), which the Spark session reads via nanosAsLong.

documents.text gets a per-replica suffix token (" repN") so the corpus does
not degenerate into 10-way EXACT duplicates; the replicas remain rich
NEAR-duplicates of each other, which makes the sf1 dedup workload
adversarially harder than a natural 10x corpus (candidate pairs grow ~1000x)
— deliberate: it stress-tests the capped-bucket/candidate-bounded designs.

Dev tool only (driver-side python). Usage: python3 tools/make_sf1.py

Vocabulary-growth mode (`--vocab`, writes /tmp/graft_sf1v): the plain sf1
replication leaves the DISTINCT-token count unchanged (replicas share the
sf0.1 vocabulary plus one " repN" marker), so vocabulary-bounded queries
(text_vocab, text_heavy, text_oov, text_pmi) see a 10x corpus but a ~1x
vocabulary. In vocab mode every token of replica r > 0 gets a per-replica
suffix ("tok" -> "tok_rN"), making the replica vocabularies DISJOINT:
distinct tokens, distinct bigrams, and per-term group counts all grow
~10x while doc count and per-doc shape grow exactly as in sf1. Only
`documents` is replicated (the text family reads nothing else); the other
tables are copied from sf0.1 so the directory stays valid for any query.
"""
import shutil
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = "/tmp/graft_sf1"
REPS = 10

SHIFTS = {
    "customer": {"c_custkey": 1_000_000},
    "supplier": {"s_suppkey": 1_000_000},
    "part": {"p_partkey": 1_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {"l_orderkey": 10_000_000, "l_partkey": 1_000_000,
                 "l_suppkey": 1_000_000},
    "events": {"event_id": 10_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}


def main():
    import os
    os.makedirs(DST, exist_ok=True)
    t0 = time.time()
    for t in ["region", "nation"]:
        shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
    for t, keymap in SHIFTS.items():
        tab = pq.read_table(f"{SRC}/{t}.parquet")
        parts = []
        for rep in range(REPS):
            r = tab
            for colname, unit in keymap.items():
                idx = r.schema.get_field_index(colname)
                col = r.column(colname)
                shifted = pc.add(col, pa.scalar(rep * unit, type=col.type))
                r = r.set_column(idx, r.schema.field(colname), shifted)
            if t == "documents" and rep > 0:
                idx = r.schema.get_field_index("text")
                newtext = pc.binary_join_element_wise(
                    r.column("text").cast(pa.string()),
                    pa.scalar(f"rep{rep}"), " ")
                r = r.set_column(idx, r.schema.field("text"),
                                 newtext.cast(r.schema.field("text").type))
            parts.append(r)
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{DST}/{t}.parquet", row_group_size=8192)
        print(t, out.num_rows, f"{time.time() - t0:.1f}s")


def main_vocab():
    """10x docs AND ~10x distinct tokens: per-replica token suffixes make
    each replica's vocabulary disjoint from every other's."""
    import os
    dst = "/tmp/graft_sf1v"
    os.makedirs(dst, exist_ok=True)
    t0 = time.time()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "embeddings"]:
        shutil.copy(f"{SRC}/{t}.parquet", f"{dst}/{t}.parquet")
    tab = pq.read_table(f"{SRC}/documents.parquet")
    shift = SHIFTS["documents"]["doc_id"]
    parts = []
    for rep in range(REPS):
        r = tab
        idx = r.schema.get_field_index("doc_id")
        col = r.column("doc_id")
        r = r.set_column(idx, r.schema.field("doc_id"),
                         pc.add(col, pa.scalar(rep * shift, type=col.type)))
        if rep > 0:
            tidx = r.schema.get_field_index("text")
            text = r.column("text").cast(pa.string())
            # suffix every token: "a b c" -> "a_rN b_rN c_rN" (corpus is
            # single-space separated; suffix the separator, then the tail)
            suffixed = pc.binary_join_element_wise(
                pc.replace_substring(text, " ", f"_r{rep} "),
                pa.scalar(f"_r{rep}"), "")
            r = r.set_column(tidx, r.schema.field("text"),
                             suffixed.cast(r.schema.field("text").type))
        parts.append(r)
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{dst}/documents.parquet", row_group_size=8192)
    print("documents", out.num_rows, f"{time.time() - t0:.1f}s")


if __name__ == "__main__":
    import sys
    if "--vocab" in sys.argv:
        main_vocab()
    else:
        main()
