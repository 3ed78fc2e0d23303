#!/usr/bin/env python3
"""Build a 3x-scale copy of sf0.1 at /tmp/graft_sf03 with remapped ids.

Purpose: scale-dependence testing beyond the bench SF. Every fact row
is tripled with id offsets (dims stay single), so every document gains
3 exact copies — a harsher-than-3x workload for the dedup family.
Run the full gate against it:

    python3 tools/make_scale3.py
    sbt "runMain graft.Verify /tmp/graft_sf03 /tmp/verify_sf03"
    python3 tools/selfcheck.py /tmp/graft_sf03 /tmp/verify_sf03
    SPARK_GRAFT_SF_DIR=/tmp/graft_sf03 sbt "runMain graft.Bench"

This gate caught a real bug in round 3: multidf_union's raw double
money sum drifted in the 4th decimal at 1e10 magnitudes.
"""
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc
import os

SRC = "/root/testdata/sf0.1"
DST = "/tmp/graft_sf03"
os.makedirs(DST, exist_ok=True)

# per-table id columns that must stay unique across copies
offset_cols = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "nation": [],   # dims stay as-is (no triple)
    "region": [],
}
OFF = 100_000_000

for t, keys in offset_cols.items():
    src = pq.read_table(f"{SRC}/{t}.parquet")
    if not keys:
        pq.write_table(src, f"{DST}/{t}.parquet")
        print(t, src.num_rows, "->", src.num_rows, "(dim, unchanged)")
        continue
    copies = [src]
    for i in (1, 2):
        c = src
        for k in keys:
            idx = c.schema.get_field_index(k)
            col = pc.add(c.column(k), pa.scalar(i * OFF, type=c.schema.field(k).type))
            c = c.set_column(idx, c.schema.field(k), col)
        copies.append(c)
    out = pa.concat_tables(copies)
    pq.write_table(out, f"{DST}/{t}.parquet")
    print(t, src.num_rows, "->", out.num_rows)
