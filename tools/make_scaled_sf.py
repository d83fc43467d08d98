"""Build an Nx-scaled copy of a testdata sf dir for SCALE VALIDATION ONLY.

The driver's round-end bench may run at a larger driver-generated scale
factor; this tool approximates that locally by unioning N key-shifted
copies of each fact table (dimensions region/nation are kept as-is), so
optimizations can be checked at ~sf1.0 row counts without touching the
read-only /root/testdata.  Key offsets preserve referential integrity
(l_orderkey -> orders, o_custkey -> customer, ...).  Document text gets a
per-copy suffix token so exact-dup operators don't degenerate to 100%
duplicates (near-dup operators still see inflated cross-copy similarity —
a conservative overestimate, bounded by their bucket caps).

Usage: python tools/make_scaled_sf.py /root/testdata/sf0.1 /tmp/sf0.1x10 10
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# per-table: {column: offset_unit}; offset for copy i is i * unit
KEYED = {
    "customer": {"c_custkey": 15000},
    "documents": {"doc_id": 5000},
    "embeddings": {"vec_id": 2000},
    "events": {"event_id": 100000, "user_id": None},  # None -> max+1
    "lineitem": {"l_orderkey": 150000, "l_partkey": 20000, "l_suppkey": 1000},
    "orders": {"o_orderkey": 150000, "o_custkey": 15000},
    "part": {"p_partkey": 20000},
    "supplier": {"s_suppkey": 1000},
}
DIMS = ["region", "nation"]


def main() -> None:
    src, dst, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    for name in DIMS:
        pq.write_table(
            pq.read_table(f"{src}/{name}.parquet"), f"{dst}/{name}.parquet"
        )
        print(name, "copied")
    for name, keys in KEYED.items():
        t = pq.read_table(f"{src}/{name}.parquet")
        units = {}
        for col, unit in keys.items():
            if unit is None:
                unit = pc.max(t.column(col)).as_py() + 1
            units[col] = unit
        copies = []
        for i in range(n):
            cols = []
            for field in t.schema.names:
                c = t.column(field)
                if field in units and i:
                    c = pc.add(c, pa.scalar(i * units[field], type=c.type))
                if name == "documents" and field == "text" and i:
                    c = pc.binary_join_element_wise(
                        c, pa.scalar(f" copymark{i}"), ""
                    )
                cols.append(c)
            copies.append(pa.table(dict(zip(t.schema.names, cols))))
        big = pa.concat_tables(copies)
        # mimic the driver's layout: the writer defaults to ~1M-row row
        # groups, so small tables (documents, embeddings) stay ONE row
        # group even at sf1.0 — the narrow-scan case the fan floor exists
        # for — while lineitem splits naturally
        pq.write_table(big, f"{dst}/{name}.parquet", row_group_size=1_000_000)
        print(name, len(big), "rows")


if __name__ == "__main__":
    main()
