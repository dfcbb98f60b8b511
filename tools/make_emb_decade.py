#!/usr/bin/env python3
"""Generate an EMBEDDINGS-ONLY decade point (default /tmp/graft_sf100e,
REPS=1000 -> 2M vectors) from the read-only sf0.1 testdata — the r15
adaptive-IVF rehearsal's far point, where `centroidsFor` resolves to 89
lists and the fixed-16-list arm's probe cost has grown ~8x past it.

Only `embeddings` is replicated (the ANN probe family reads nothing else);
every other table copies from sf0.1 so the directory stays valid for any
query that happens to touch one. Same generator discipline as
tools/make_sf10_docs.py: pyarrow key-shift replication, physical parquet
types byte-preserved, multi-row-group output (the r14 single-row-group
fan-out starvation lesson).

Dev tool only (driver-side python).
Usage: python3 tools/make_emb_decade.py [REPS] [DST]
"""
import shutil
import sys
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf100e"


def main():
    import os
    os.makedirs(DST, exist_ok=True)
    t0 = time.time()
    for t in ["region", "nation", "part", "events", "customer", "supplier",
              "orders", "lineitem", "documents"]:
        shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
    tab = pq.read_table(f"{SRC}/embeddings.parquet")
    idx = tab.schema.get_field_index("vec_id")
    parts = []
    for rep in range(REPS):
        col = tab.column("vec_id")
        shifted = pc.add(col, pa.scalar(rep * 1_000_000, type=col.type))
        parts.append(tab.set_column(idx, tab.schema.field("vec_id"), shifted))
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{DST}/embeddings.parquet", row_group_size=8192)
    print("embeddings", out.num_rows, f"{time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
