#!/usr/bin/env python3
"""Dev-only: build an ~sf1 test dir as a key-shifted x10 replica of sf0.1.

Mirrors ScaleBench.replicate's semantics (same key map, same 1e9 shift,
same per-copy document-text token mutation so dedup queries see mutated —
not byte-identical — copies), but runs driver-side with pyarrow so the
output is a SINGLE .parquet file per table (check.py's DuckDB views read
`{dir}/{table}.parquet` as a file) and the events `ts` column keeps its
nanosecond physical type bit-for-bit (a DuckDB COPY round-trip would
truncate to micros; pyarrow preserves timestamp[ns]).

Usage: python3 tools/make_bigsf.py [src] [dst] [copies]
Then:  python3 tools/check.py <dst> /tmp/verify_sf1
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SHIFT = 1_000_000_000  # ScaleBench.Shift
SHIFTED = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
ASIS = ["nation", "region"]


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    import os
    os.makedirs(dst, exist_ok=True)
    for table, keys in SHIFTED.items():
        base = pq.read_table(f"{src}/{table}.parquet")
        parts = []
        for i in range(copies):
            t = base
            for k in keys:
                idx = t.schema.get_field_index(k)
                t = t.set_column(idx, k, pc.add(t.column(k), i * SHIFT))
            if table == "documents":
                # prefix every token per copy (replicate():68-71) so the
                # copies are near-dups, not byte dups, of the original
                idx = t.schema.get_field_index("text")
                text = pc.replace_substring_regex(
                    t.column("text"), r"(\S+)", rf"c{i}\1")
                t = t.set_column(idx, "text", text)
                nc = t.schema.get_field_index("n_chars")
                t = t.set_column(nc, "n_chars",
                                 pc.cast(pc.utf8_length(text), pa.int64()))
            parts.append(t)
        out = pa.concat_tables(parts)
        # coerce_timestamps=None keeps events.ts as timestamp[ns]
        pq.write_table(out, f"{dst}/{table}.parquet")
        print(f"bigsf: {table} x{copies} -> {out.num_rows} rows")
    for t in ASIS:
        pq.write_table(pq.read_table(f"{src}/{t}.parquet"),
                       f"{dst}/{t}.parquet")
        print(f"bigsf: {t} copied as-is")


if __name__ == "__main__":
    main()
