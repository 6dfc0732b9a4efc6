"""Generate an sf1-scale dataset by tiling sf0.1 ten times with shifted keys.

The driver ships sf0.001/0.01/0.1 only; the sf1 scaling spot-check needs
~10× sf0.1. Each copy k shifts every key column by k × (max_key + 1) of
its defining table, so foreign keys stay consistent (orders.o_custkey
moves with customer.c_custkey, lineitem follows orders/part/supplier) and
per-key row-count distributions — including the user_id skew profile the
window queries are sized for — are preserved exactly. Dimension tables
region/nation are genuinely dimension-like and stay fixed.

Usage: python tools/make_sf1.py [src_sf_dir] [dst_dir] [copies]
Default: /root/testdata/sf0.1 → /root/repo/.sf1 × 10
"""

from __future__ import annotations

import os
import sys

import duckdb

# key columns per table: (column, table whose max defines the modulus)
KEYED = {
    "customer": [("c_custkey", "customer")],
    "supplier": [("s_suppkey", "supplier")],
    "part": [("p_partkey", "part")],
    "orders": [("o_orderkey", "orders"), ("o_custkey", "customer")],
    "lineitem": [
        ("l_orderkey", "orders"),
        ("l_partkey", "part"),
        ("l_suppkey", "supplier"),
    ],
    "events": [("event_id", "events"), ("user_id", "events:user_id")],
    "documents": [("doc_id", "documents")],
    "embeddings": [("vec_id", "embeddings")],
}
COPY_AS_IS = ["region", "nation"]


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.sf1"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)

    con = duckdb.connect()
    for t in list(KEYED) + COPY_AS_IS:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}/{t}.parquet'")

    # moduli: max+1 of each defining key
    mod: dict[str, int] = {}
    for table, cols in KEYED.items():
        for _col, ref in cols:
            if ref not in mod:
                rt, rc = (ref.split(":") + [None])[:2]
                rc = rc or dict(cols)[_col] if rt == table else rc
                keycol = ref.split(":")[1] if ":" in ref else _col
                mod[ref] = con.execute(
                    f"SELECT max({keycol}) + 1 FROM {rt}"
                ).fetchone()[0]

    for t in COPY_AS_IS:
        con.execute(f"COPY (SELECT * FROM {t}) TO '{dst}/{t}.parquet' (FORMAT parquet)")
        print(f"{t}: copied")

    for t, cols in KEYED.items():
        shifted = dict(cols)
        names = [r[0] for r in con.execute(f"DESCRIBE {t}").fetchall()]
        sel = ", ".join(
            f"{c} + k * {mod[shifted[c]]} AS {c}" if c in shifted else c for c in names
        )
        con.execute(
            f"COPY (SELECT {sel} FROM {t}, range({copies}) AS r(k)) "
            f"TO '{dst}/{t}.parquet' (FORMAT parquet)"
        )
        n = con.execute(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
