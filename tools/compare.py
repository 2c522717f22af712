#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle on the same parquet tables.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            duck = con.execute(sql)
            duck_cols = [d[0] for d in duck.description]
            duck_rows = canon(duck.fetchall(), duck_cols)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            n_bad += 1
            continue
        try:
            tbl = pq.read_table(f"{out_dir}/{name}")
            spark_cols = tbl.column_names
            spark_rows = canon([tuple(r.values())
                                for r in tbl.to_pylist()], spark_cols)
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {str(e)[:200]}")
            n_bad += 1
            continue
        if sorted(duck_cols) != sorted(spark_cols):
            print(f"FAIL {name}: schema {sorted(spark_cols)} != {sorted(duck_cols)}")
            n_bad += 1
            continue
        if len(duck_rows) != len(spark_rows):
            print(f"FAIL {name}: rows {len(spark_rows)} != oracle {len(duck_rows)}")
            n_bad += 1
            continue
        bad = None
        for i, (dr, sr) in enumerate(zip(duck_rows, spark_rows)):
            if dr != sr:
                eq = all(
                    (isinstance(a, float) and isinstance(b, float)
                     and (math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)))
                    or a == b for a, b in zip(dr, sr))
                if not eq:
                    bad = (i, dr, sr)
                    break
        if bad:
            print(f"FAIL {name}: row {bad[0]}: spark={bad[2]} duck={bad[1]}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(spark_rows)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
