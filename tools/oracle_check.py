#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify output
against the DuckDB oracle on the same parquet tables and compare result sets.

Usage: python3 tools/oracle_check.py <sfDir> <outDir> [only_query ...]
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)

Comparison mimics the DRIVER's pandas-based gate, not a lenient local one:
- both sides are loaded THROUGH pandas (spark parquet via pyarrow.to_pandas,
  oracle via duckdb .df()) so dtype widenings the driver would see are seen
  here too — e.g. DuckDB sums BIGINT into HUGEINT, which pandas converts to
  float64; fetchall() would have hidden that as exact Python ints (that
  exact class of drift cost q_compaction_bins two red rounds);
- dtype KINDS must match column-by-column (int64 vs float64 = FAIL even when
  every cell compares equal numerically);
- array-typed output columns (list / ndarray cells) are REJECTED outright:
  the driver's sort_values/hash dies on them ("unhashable type"), so they can
  never be verified by the gate (sim_jl_project's original shape).
"""
import json
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def dtype_kind(dt):
    """Collapse a pandas dtype to the equivalence class the driver's value
    hash distinguishes: integer-ish, float, datetime, or string/object."""
    k = getattr(dt, "kind", "O")
    if k in ("b", "i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k in ("M", "m"):
        return "datetime"
    return "obj"


def array_cols(df):
    bad = []
    for c in df.columns:
        if df[c].dtype == object:
            col = df[c].dropna()
            if len(col) and isinstance(col.iloc[0], (list, tuple, np.ndarray, dict)):
                bad.append(c)
    return bad


def norm_cell(v):
    if v is None or (isinstance(v, float) and v != v):
        return "null"
    if isinstance(v, (bool, np.bool_)):
        return "b" + str(bool(v))
    if isinstance(v, (float, np.floating)):
        return "f" + float(v).hex()
    if isinstance(v, (int, np.integer)):
        return "i" + str(int(v))
    if isinstance(v, bytes):
        return "y" + v.hex()
    return "s" + str(v)


def norm_frame(df):
    names = sorted(df.columns)
    rows = [tuple(norm_cell(r[c]) for c in names)
            for r in df.to_dict("records")]
    rows.sort()
    return names, rows


def main(sf_dir, out_dir, only=()):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            sdf = pq.read_table(f"{out_dir}/{name}").to_pandas()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}")
            n_fail += 1
            continue
        try:
            ddf = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        bad = array_cols(sdf) + array_cols(ddf)
        if bad:
            print(f"FAIL {name}: array-typed column(s) {sorted(set(bad))} — "
                  f"the driver's comparator cannot hash these; reshape the output")
            n_fail += 1
            continue
        if sorted(sdf.columns) != sorted(ddf.columns):
            print(f"FAIL {name}: columns differ spark={sorted(sdf.columns)} "
                  f"duck={sorted(ddf.columns)}")
            n_fail += 1
            continue
        kind_diff = [(c, dtype_kind(sdf[c].dtype), dtype_kind(ddf[c].dtype))
                     for c in sdf.columns
                     if dtype_kind(sdf[c].dtype) != dtype_kind(ddf[c].dtype)]
        if kind_diff:
            print(f"FAIL {name}: dtype kind mismatch (driver hashes these "
                  f"differently even when values agree): "
                  + ", ".join(f"{c}: spark={a} duck={b}" for c, a, b in kind_diff))
            n_fail += 1
            continue
        sn, srows = norm_frame(sdf)
        dn, drows = norm_frame(ddf)
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
    sys.exit(main(sys.argv[1], sys.argv[2], tuple(sys.argv[3:])))
