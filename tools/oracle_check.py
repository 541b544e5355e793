#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify output
against the DuckDB oracle on the same parquet tables and compare result sets.

Usage: python3 tools/oracle_check.py <sfDir> <outDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)

Comparison: for each query, load the Spark parquet result and the DuckDB
result, sort columns by name, sort rows, and compare cell-by-cell (floats
bit-exact, to match a hash-based driver compare as strictly as possible).
"""
import json
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        return v.hex() if v == v else "nan"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return str(type(v).__name__[:1]) + str(v)


def norm_table(names, rows):
    order = sorted(range(len(names)), key=lambda i: names[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [names[i] for i in order], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            tbl = pq.read_table(f"{out_dir}/{name}")
            spark_names = tbl.column_names
            spark_rows = [tuple(row[c] for c in spark_names)
                          for row in tbl.to_pylist()]
            spark_rows = [tuple(r) for r in spark_rows]
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}")
            n_fail += 1
            continue
        try:
            res = con.execute(sql)
            duck_names = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        sn, srows = norm_table(spark_names, spark_rows)
        dn, drows = norm_table(duck_names, duck_rows)
        if sn != dn:
            print(f"FAIL {name}: columns differ spark={sn} duck={dn}")
            n_fail += 1
            continue
        if srows != drows:
            n_fail += 1
            print(f"FAIL {name}: {len(srows)} spark rows vs {len(drows)} duck rows; first diffs:")
            shown = 0
            for i in range(max(len(srows), len(drows))):
                s = srows[i] if i < len(srows) else None
                d = drows[i] if i < len(drows) else None
                if s != d:
                    print(f"  [{i}] spark={s}")
                    print(f"      duck ={d}")
                    shown += 1
                    if shown >= 3:
                        break
            continue
        n_pass += 1
        print(f"PASS {name} ({len(srows)} rows)")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
