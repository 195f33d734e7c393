#!/usr/bin/env python3
"""Same-corpus DuckDB leg of the bench A/B (round-7 VERDICT task #1).

Times the oracle-SQL forms of the 20 BENCH headline queries in DuckDB on
an arbitrary sf/replica directory, with the exact BASELINE.md methodology
(1 warm-up run, then best of 3 timed fetchall runs per query). Prints one
JSON line. Run graft.Bench on the SAME directory in the SAME session for
the Spark leg.

Usage: tools/bench_ab.py <sfDir> <oracle_sql.json> [threads] [skip,keys]
"""
import sys, json, time
import duckdb

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

HEADLINE = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
    "q6_forecast_revenue", "semi_join_exists", "anti_join",
    "window_rank_topn", "window_running_sum", "rollup_agg", "distinct_agg",
    "approx_distinct", "set_ops", "string_funcs", "date_funcs",
    "events_sessionize_tumbling", "json_extract", "text_tokenize_tf",
    "exact_dedup", "similarity_topk", "asof_enrich"]


# The verify-oracle form of similarity_topk (unnest + per-dim SUM) exists
# for bit-exact correctness compare; for TIMING it is pathological (the
# unnest CTE materializes n^2/2 * dim rows). Fairness to the baseline
# means giving DuckDB its best-known formulation: native list_dot_product
# with precomputed norms — same result set at 6-decimal rounding.
FAST_SQL = {
    # approx_distinct is no-oracle for CORRECTNESS (sketches differ across
    # engines); for TIMING DuckDB runs its own native HLL — same query
    # shape, each engine's own sketch.
    "approx_distinct": """
SELECT o_orderstatus,
  approx_count_distinct(o_custkey) AS approx_cust
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "similarity_topk": """
WITH e AS (SELECT vec_id, embedding,
             SQRT(list_dot_product(embedding, embedding)) AS nrm
           FROM embeddings)
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
  ROUND(list_dot_product(a.embedding, b.embedding) / (a.nrm * b.nrm), 6)
    AS sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
ORDER BY sim DESC, a_id, b_id LIMIT 100""",
}


def main():
    sf_dir = sys.argv[1]
    oracle_path = sys.argv[2]
    threads = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    skip = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else set()
    oracle = json.load(open(oracle_path))
    oracle.update(FAST_SQL)
    con = duckdb.connect()
    con.execute(f"SET threads={threads}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    results = {}
    for name in HEADLINE:
        if name in skip or name not in oracle:
            results[name] = None
            continue
        sql = oracle[name]
        con.execute(sql).fetchall()  # warm-up
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        results[name] = round(best, 6)
    total = sum(v for v in results.values() if v is not None)
    print(json.dumps({"metric": "duckdb_total", "value": round(total, 6),
                      "unit": "sec", "threads": threads,
                      "queries": results, "sf": sf_dir}))


if __name__ == "__main__":
    main()
