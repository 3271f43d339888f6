#!/usr/bin/env python3
"""Local differential harness mimicking the driver's correctness gate:
run graft.Verify at a scale factor, then execute each oracle SQL in DuckDB
over the same parquet tables and compare values.

Usage: python3 scripts/check.py [sfDir] [outDir]
"""
import json, math, subprocess, sys, glob, os

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
# optional: comma-separated query-name prefixes for fast local iteration
ONLY = sys.argv[3] if len(sys.argv) > 3 else None

import duckdb
import numpy as np
import pyarrow.parquet as pq
import pyarrow.dataset as pds

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return round(v, 9)
    if isinstance(v, bytes): return v.hex()
    return str(v) if not isinstance(v, (int, bool, type(None))) else v

def keypart(v):
    # type-normalized sort component: None first, then numerics (bool/int/
    # float compare as float so True vs 1 vs 1.0 collate identically), then
    # everything else by str — distinct-but-equal values of different types
    # can no longer order equal multisets differently across the two lists.
    if v is None:
        return (0, "")
    if isinstance(v, (bool, int, float)):
        return (1, "", float(v))
    return (2, str(v))

def canon(rows):
    return sorted([tuple(norm(v) for v in r) for r in rows],
                  key=lambda r: [keypart(v) for v in r])

def main():
    # 1. run Verify
    argv = ["bash", "scripts/run_main.sh", "graft.Verify", SF, OUT]
    if ONLY: argv.append(ONLY)
    r = subprocess.run(argv, capture_output=True, text=True)
    if r.returncode != 0:
        print("VERIFY FAILED"); print(r.stdout[-3000:]); print(r.stderr[-5000:])
        sys.exit(1)
    for line in r.stderr.splitlines():
        if "[verify]" in line: print(line)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    n_pass = n_fail = 0
    declared = sorted(oracle.keys())
    for name in declared:
        pdir = f"{OUT}/{name}"
        files = glob.glob(f"{pdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result written"); n_fail += 1; continue
        spark_tbl = pds.dataset(pdir, format="parquet").to_table()
        spark_cols = sorted(spark_tbl.column_names)
        spark_rows = [[spark_tbl.column(c)[i].as_py() for c in spark_cols]
                      for i in range(spark_tbl.num_rows)]
        try:
            res = con.execute(oracle[name])
            duck_cols_raw = [d[0] for d in res.description]
            duck_pdf = res.df()   # pandas, like the driver (HUGEINT→float64)
            def topy(v):
                if v is None: return None
                if isinstance(v, np.generic): v = v.item()
                if isinstance(v, float) and math.isnan(v): return None
                return v
            duck_all = [tuple(topy(v) for v in r)
                        for r in duck_pdf.itertuples(index=False, name=None)]
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_fail += 1; continue
        duck_cols = sorted(duck_cols_raw)
        idx = [duck_cols_raw.index(c) for c in duck_cols]
        duck_rows = [[r[i] for i in idx] for r in duck_all]
        if spark_cols != duck_cols:
            print(f"FAIL {name}: cols {spark_cols} vs {duck_cols}"); n_fail += 1; continue
        # --- driver-faithfulness checks (round-3 lessons: the driver's
        # pandas harness crashes on ndarray cells and hashes dtypes, so
        # value-equality alone is NOT the contract). Compare the pandas
        # dtype each side would present to the driver. ---
        harness_fail = None
        spark_pdf = spark_tbl.to_pandas()
        for c in spark_cols:
            sk, dk = spark_pdf[c].dtype.kind, duck_pdf[c].dtype.kind
            if "f" in (sk, dk) and (sk in "iu" or dk in "iu"):
                harness_fail = (f"int-vs-float dtype mismatch in column '{c}' "
                                f"(spark {spark_pdf[c].dtype} vs duck {duck_pdf[c].dtype}; "
                                f"driver hashes 56 != 56.0)")
                break
            cells = ([v for v in spark_pdf[c]] + [v for v in duck_pdf[c]])
            if any(isinstance(v, (np.ndarray, list, dict)) for v in cells):
                harness_fail = (f"array/struct cell in column '{c}' "
                                f"(driver pandas comparator crashes on ndarray cells)")
                break
        if harness_fail:
            print(f"FAIL {name}: {harness_fail}"); n_fail += 1; continue
        a, b = canon(spark_rows), canon(duck_rows)
        if a == b:
            print(f"PASS {name} ({len(a)} rows)"); n_pass += 1
        else:
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    print(f"  first diff row {i}:\n   spark {x}\n   duck  {y}"); break
            if len(a) != len(b):
                only_a = [r for r in a if r not in b][:3]
                only_b = [r for r in b if r not in a][:3]
                print(f"   only-spark {only_a}\n   only-duck  {only_b}")
            n_fail += 1
    print(f"\n{n_pass}/{n_pass+n_fail} pass")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
