#!/usr/bin/env python3
"""Local pre-check that mimics the driver's DuckDB oracle compare.

Usage: python3 scripts/check_oracle.py /tmp/verify_out /root/testdata/sf0.01

For each query dumped by graft.Verify: load the Spark parquet result, run
the oracle SQL in DuckDB against the same testdata parquet tables, sort
columns by name, sort rows, and compare exactly (bitwise for floats).
Dev-only tool — the shipped library has no Python dependency.
"""
import json, sys, glob, math
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            spark_df = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        spark_df = spark_df.reindex(sorted(spark_df.columns), axis=1)
        duck_df = duck_df.reindex(sorted(duck_df.columns), axis=1)
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns {list(spark_df.columns)} vs {list(duck_df.columns)}")
            n_fail += 1; continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}"); n_fail += 1; continue
        sd = spark_df.sort_values(list(spark_df.columns)).reset_index(drop=True)
        dd = duck_df.sort_values(list(duck_df.columns)).reset_index(drop=True)
        # Dtype-strict gate: the driver's compare hashes TYPED values, so a
        # DuckDB HUGEINT/DECIMAL column (pandas float64/object) against a
        # Spark int64 must fail here too, even when the values coincide.
        # Both frames come through the same duckdb->pandas conversion, so
        # dtypes are comparable symmetrically.
        dtype_bad = [f"{c}: spark {sd[c].dtype} vs oracle {dd[c].dtype}"
                     for c in sd.columns if sd[c].dtype != dd[c].dtype]
        if dtype_bad:
            print(f"FAIL {name}: dtype mismatch " + "; ".join(dtype_bad))
            n_fail += 1; continue
        bad = []
        for c in sd.columns:
            a, b = sd[c], dd[c]
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                eq = (a == b) | (a.isna() & b.isna())
            else:
                eq = (a.astype(str) == b.astype(str)) | (a.isna() & b.isna())
            if not eq.all():
                i = int((~eq).idxmax())
                bad.append(f"{c}[{i}]: {a[i]!r} vs {b[i]!r} (n={int((~eq).sum())})")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad[:3])); n_fail += 1
        else:
            print(f"PASS {name} ({len(sd)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
