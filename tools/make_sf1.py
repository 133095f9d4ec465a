#!/usr/bin/env python3
"""Build a ~sf1 scale-test dataset (10x sf0.1) at /tmp/sf1.

Concatenates each sf0.1 table 10 times with per-copy key offsets so
entities stay distinct (keys, FKs re-pointed consistently); region and
nation stay single-copy (fixed dims). events.parquet goes through
pyarrow because DuckDB's parquet writer downcasts TIMESTAMP_NS to
micros and the engine's Tables.events expects the nanos physical type.

Usage: python3 tools/make_sf1.py [src=/root/testdata/sf0.1] [out=/tmp/sf1]
Dev tool only - not part of the library.
"""
import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

N = 10
PLANS = {
    "region": None,
    "nation": None,
    "customer": {"c_custkey": 10**7},
    "supplier": {"s_suppkey": 10**6},
    "part": {"p_partkey": 10**7},
    "orders": {"o_orderkey": 10**8, "o_custkey": 10**7},
    "lineitem": {"l_orderkey": 10**8, "l_partkey": 10**7,
                 "l_suppkey": 10**6},
    "documents": {"doc_id": 10**7},
    "embeddings": {"vec_id": 10**7},
}
EVENTS_OFFS = {"event_id": 10**8, "user_id": 10**6}


def main(src, out):
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t, offs in PLANS.items():
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()]
        if offs is None:
            sel = [f"SELECT * FROM '{src}/{t}.parquet'"]
        else:
            sel = []
            for i in range(N):
                exprs = [f"{c} + {i * offs[c]} AS {c}" if c in offs else c
                         for c in cols]
                sel.append("SELECT " + ", ".join(exprs) +
                           f" FROM '{src}/{t}.parquet'")
        con.execute(f"COPY ({' UNION ALL '.join(sel)}) TO "
                    f"'{out}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(t, n)

    t = pq.read_table(f"{src}/events.parquet")
    copies = []
    for i in range(N):
        tt = t
        for c, off in EVENTS_OFFS.items():
            idx = tt.schema.get_field_index(c)
            tt = tt.set_column(idx, c, pc.add(tt[c], i * off))
        copies.append(tt)
    merged = pa.concat_tables(copies)
    pq.write_table(merged, f"{out}/events.parquet")
    print("events", merged.num_rows,
          merged.schema.field("ts").type)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1",
         sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1")
