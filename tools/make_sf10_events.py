#!/usr/bin/env python3
"""Generate a 100x EVENTS-ONLY probe dataset (/tmp/graft_sf10ev) from the
read-only sf0.1 testdata: events is key-shift-replicated 100x (10M rows,
1M users), every other table is copied at sf0.1 so the directory stays
valid for any query that touches a dimension.

Purpose: stress the staged-sort events backbone (EventsBackbone) one
decade past the sf1 rehearsal — the session/funnel/window family should
scale linearly in events with the staging paying one shuffle total.

Dev tool only (driver-side python). Usage: python3 tools/make_sf10_events.py
"""
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = "/tmp/graft_sf10ev"
REPS = 100
SHIFT = {"event_id": 10_000_000, "user_id": 1_000_000}


def main():
    import os, time
    t0 = time.time()
    os.makedirs(DST, exist_ok=True)
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "documents", "embeddings"]:
        shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
    tab = pq.read_table(f"{SRC}/events.parquet")
    parts = []
    for rep in range(REPS):
        r = tab
        for colname, unit in SHIFT.items():
            idx = r.schema.get_field_index(colname)
            col = r.column(colname)
            shifted = pc.add(col, pa.scalar(rep * unit, type=col.type))
            r = r.set_column(idx, r.schema.field(colname), shifted)
        parts.append(r)
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{DST}/events.parquet")
    print("events", out.num_rows, f"{time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
