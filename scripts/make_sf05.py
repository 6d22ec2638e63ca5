"""Synthesize a scaled test-data directory from the driver's sf0.1.

Round-8 verdict item 9 wants one committed bench run at sf0.5 (the
driver gate stays sf0.1) to surface constant factors that hide at
small scale. The driver only generates sf{0.001,0.01,0.1}, so this
script scales sf0.1 by 5x into `<repo>/.bench_data/sf0.5`
(gitignored):

- dimension tables (region, nation) are kept as-is;
- fact/entity tables are unioned 5x with every entity key offset by
  `rep * (max_key + 1)`, consistently ACROSS tables (an orders replica
  references the customer replica with the same rep), so join
  cardinalities scale linearly like a real bigger dataset;
- `documents.text` gets a per-replica suffix and `embeddings.embedding`
  a tiny per-replica rotation, so dedup/ANN candidate structure scales
  ~linearly instead of creating 5x identical-content buckets (25x
  candidate pairs) that no real corpus has;
- `events` keeps its timestamp range (same window, 5x the rate) with
  user_id offset per replica.

Usage:  python scripts/make_sf05.py  [src_sf_dir]  [out_dir]  [reps]
(reps defaults to 5 -> sf0.5; reps=10 -> sf1.0, VERDICT r8 item 8)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 5          # default; argv[3] overrides

KEY_OFFSETS = {
    # table -> {column: entity} ; per-entity offsets are consistent
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part",
                 "l_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
DIMS = ("region", "nation")


def main() -> None:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    reps_n = int(sys.argv[3]) if len(sys.argv) > 3 else REPS
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = (sys.argv[2] if len(sys.argv) > 2 else
           os.path.join(os.path.dirname(os.path.dirname(
               os.path.abspath(__file__))), ".bench_data",
               f"sf{reps_n / 10:g}"))
    os.makedirs(out, exist_ok=True)

    # per-entity strides from the base tables
    stride: dict[str, int] = {}
    tables: dict[str, pa.Table] = {}
    for name in list(KEY_OFFSETS) + list(DIMS):
        tables[name] = pq.read_table(os.path.join(src, f"{name}.parquet"))
    for name, cols in KEY_OFFSETS.items():
        for col, entity in cols.items():
            mx = pc.max(tables[name][col]).as_py() or 0
            stride[entity] = max(stride.get(entity, 0), int(mx) + 1)

    for name in DIMS:
        pq.write_table(tables[name], os.path.join(out, f"{name}.parquet"))
        print(f"{name}: dim copied ({tables[name].num_rows} rows)")

    for name, cols in KEY_OFFSETS.items():
        base = tables[name]
        reps = []
        for r in range(reps_n):
            t = base
            for col, entity in cols.items():
                idx = t.schema.get_field_index(col)
                shifted = pc.add(t[col], r * stride[entity])
                t = t.set_column(idx, t.schema.field(idx),
                                 shifted.cast(t.schema.field(idx).type))
            if name == "documents" and r > 0:
                idx = t.schema.get_field_index("text")
                suffixed = pc.binary_join_element_wise(
                    t["text"].cast(pa.string()), f" r{r}", "")
                t = t.set_column(idx, t.schema.field(idx),
                                 suffixed.cast(t.schema.field(idx).type))
            if name == "embeddings" and r > 0:
                import numpy as np
                idx = t.schema.get_field_index("embedding")
                col_e = t["embedding"].combine_chunks()
                flat = np.asarray(col_e.values.to_numpy(
                    zero_copy_only=False), dtype=np.float32)
                dim = len(flat) // t.num_rows
                # tiny deterministic per-replica rotation: shifts LSH
                # buckets without destroying the cosine structure
                flat = flat.reshape(t.num_rows, dim)
                flat = np.roll(flat, r, axis=1) * (1.0 + 0.003 * r)
                new = pa.array(list(flat.astype(np.float32)),
                               type=t.schema.field(idx).type)
                t = t.set_column(idx, t.schema.field(idx), new)
            reps.append(t)
        merged = pa.concat_tables(reps)
        pq.write_table(merged, os.path.join(out, f"{name}.parquet"))
        print(f"{name}: {base.num_rows} -> {merged.num_rows} rows")


if __name__ == "__main__":
    main()
