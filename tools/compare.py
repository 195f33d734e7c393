#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Reads each Verify output parquet, runs the matching oracle SQL in DuckDB
over the same sf dir, sorts columns by name, and compares cell-by-cell
(exact equality; floats reported with max abs diff when mismatched).

Usage: tools/compare.py /root/testdata/sf0.01 /tmp/verify_out [query ...]
"""
import sys, json, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        pq = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not pq:
            print(f"FAIL {name}: no spark output parquet"); n_bad += 1; continue
        try:
            spark_df = con.execute(f"SELECT * FROM read_parquet('{pq[0]}')").fetch_arrow_table()
            oracle_df = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_bad += 1; continue
        s_cols = sorted(spark_df.column_names)
        o_cols = sorted(oracle_df.column_names)
        if s_cols != o_cols:
            print(f"FAIL {name}: columns spark={s_cols} oracle={o_cols}"); n_bad += 1; continue
        if spark_df.num_rows != oracle_df.num_rows:
            print(f"FAIL {name}: rows spark={spark_df.num_rows} oracle={oracle_df.num_rows}"); n_bad += 1; continue
        bad = None
        for c in s_cols:
            sv = spark_df.column(c).to_pylist()
            ov = oracle_df.column(c).to_pylist()
            for i, (a, b) in enumerate(zip(sv, ov)):
                if a != b:
                    diff = ""
                    try:
                        diff = f" (absdiff={abs(float(a)-float(b)):.3e})"
                    except Exception:
                        pass
                    bad = f"col {c} row {i}: spark={a!r} oracle={b!r}{diff}"
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: {bad}"); n_bad += 1
        else:
            print(f"ok   {name} ({spark_df.num_rows} rows, {len(s_cols)} cols)"); n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
