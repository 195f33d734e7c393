#!/usr/bin/env python3
"""Scale-run comparator: DuckDB-vectorized bag equality for large outputs.

The driver-strict cell-by-cell gate (compare.py) is O(rows) in PYTHON and
is the sf0.01 acceptance path; at the 10x/100x validation scales its
to_pylist loops become the bottleneck (a 60 M-row sort_global would take
hours), so this tool checks, fully vectorized inside DuckDB:
  1. column-name sets match,
  2. row counts match,
  3. the symmetric EXCEPT ALL bag difference is empty (value-exact per
     column; both sides land as concrete tables, so doubles compare on
     their materialized values).
Row ORDER is not checked here (every declared query orders by a unique
key set; the ordered, dtype-strict check remains compare.py's job at
sf0.01). Queries without an oracle report row counts only.

Usage: tools/compare_scale.py <sfdir> <outdir> [query ...]
"""
import sys, json, glob, os
import duckdb

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # Large-oracle safety: let DuckDB spill instead of OOM-ing (the 1000x
    # inverted-index oracle materializes ~250M token rows).
    os.makedirs("/tmp/duck_spill", exist_ok=True)
    con.execute("SET temp_directory='/tmp/duck_spill'")
    con.execute("SET memory_limit='48GB'")
    con.execute("SET preserve_insertion_order=false")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    all_dirs = {os.path.basename(d)
                for d in glob.glob(os.path.join(out_dir, "*"))
                if os.path.isdir(d)}
    n_ok = n_bad = 0
    for name in sorted(all_dirs | set(oracle)):
        if only and name not in only:
            continue
        pq = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not pq:
            print(f"FAIL {name}: no spark output parquet"); n_bad += 1
            continue
        if name not in oracle:
            n = con.execute("SELECT count(*) FROM read_parquet(?)",
                            [pq[0]]).fetchone()[0]
            print(f"ok   {name} (no oracle; {n} rows)"); n_ok += 1
            continue
        con.execute("CREATE OR REPLACE TEMP TABLE _s AS "
                    f"SELECT * FROM read_parquet('{pq[0]}')")
        con.execute(f"CREATE OR REPLACE TEMP TABLE _o AS ({oracle[name]})")
        s_cols = sorted(r[1] for r in
                        con.execute("PRAGMA table_info('_s')").fetchall())
        o_cols = sorted(r[1] for r in
                        con.execute("PRAGMA table_info('_o')").fetchall())
        if s_cols != o_cols:
            print(f"FAIL {name}: columns spark={s_cols} oracle={o_cols}")
            n_bad += 1; continue
        sel = ", ".join(f'"{c}"' for c in s_cols)
        ns = con.execute("SELECT count(*) FROM _s").fetchone()[0]
        no = con.execute("SELECT count(*) FROM _o").fetchone()[0]
        if ns != no:
            print(f"FAIL {name}: rows spark={ns} oracle={no}"); n_bad += 1
            continue
        d = con.execute(
            f"SELECT count(*) FROM ("
            f"(SELECT {sel} FROM _s EXCEPT ALL SELECT {sel} FROM _o) "
            f"UNION ALL "
            f"(SELECT {sel} FROM _o EXCEPT ALL SELECT {sel} FROM _s))"
        ).fetchone()[0]
        if d:
            ex = con.execute(
                f"SELECT * FROM (SELECT {sel} FROM _s EXCEPT ALL "
                f"SELECT {sel} FROM _o) LIMIT 3").fetchall()
            print(f"FAIL {name}: bag diff {d} rows, e.g. {ex}"); n_bad += 1
        else:
            print(f"ok   {name} ({ns} rows, bag-exact)"); n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
