#!/usr/bin/env python3
"""Generate the 100x HEAVY-FAMILY probe dataset (/tmp/graft_sf10dc) from the
read-only sf0.1 testdata — the r11 verdict's growth-curve rehearsal for the
dedup/graph tier one decade past the sf1 sweep.

documents/embeddings are key-shift-replicated 100x (500k docs, 200k vecs;
replica texts get a " repN" suffix so the corpus is rich NEAR-duplicates,
not 100-way exact ones — candidate pairs grow ~10_000x, deliberately
adversarial for the capped-bucket designs), and orders/lineitem/customer/
supplier are replicated 100x too so the graph family (edges = the
customer-supplier projection of orders x lineitem) sees the same decade.
events and the small dims copy at sf0.1, keeping the directory valid for
any query.

Same generator discipline as tools/make_sf1.py: pyarrow key-shift
replication, physical parquet types byte-preserved.

Dev tool only (driver-side python). Usage: python3 tools/make_sf10_docs.py
"""
import shutil
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import sys

SRC = "/root/testdata/sf0.1"
# optional argv: REPS DST — e.g. `make_sf10_docs.py 30 /tmp/graft_sf3dc`
# generates the intermediate decade point for growth-curve fits where the
# full 100x point exceeds the sandbox's shuffle-spill ceiling
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 100
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf10dc"

SHIFTS = {
    "customer": {"c_custkey": 1_000_000},
    "supplier": {"s_suppkey": 1_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {"l_orderkey": 10_000_000, "l_partkey": 1_000_000,
                 "l_suppkey": 1_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}


def main():
    import os
    os.makedirs(DST, exist_ok=True)
    t0 = time.time()
    for t in ["region", "nation", "part", "events"]:
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


if __name__ == "__main__":
    main()
