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
        pq.write_table(out, f"{DST}/{t}.parquet")
        print(t, out.num_rows, f"{time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
