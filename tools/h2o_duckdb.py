#!/usr/bin/env python3
"""DuckDB twin of graft.H2oBench — identical derivation, identical
queries, on the same events parquet. db-benchmark (h2oai) shape; the
reference ships this harness without published numbers
(benchmarks/db-benchmark/groupby-datafusion.py), so DuckDB on the same
data is the comparison partner recorded in BENCH_H2O.md.

Usage: python tools/h2o_duckdb.py [sf_dir] [rep]
Prints one JSON line mirroring the Spark side's output.
"""
import json
import statistics
import sys
import time

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REP = int(sys.argv[2]) if len(sys.argv) > 2 else 100
ITERS = 5

con = duckdb.connect()
n_events = con.sql(
    f"SELECT count(*) FROM read_parquet('{SF}/events.parquet')").fetchone()[0]
HI = max(n_events * REP // 10, 1)

# setup (untimed, mirrors the Spark side's cached fact + dims)
con.sql(f"""
CREATE TEMP TABLE x AS
SELECT
  'id' || (user_id % 10)::VARCHAR                         AS id1,
  'id' || ((user_id + r) % 100)::VARCHAR                  AS id2,
  'id' || ((event_id * {REP} + r) % {HI})::VARCHAR        AS id3,
  (user_id % 7)::INT                                      AS id4,
  ((user_id + r) % 77)::INT                               AS id5,
  ((event_id * {REP} + r) % {HI})::BIGINT                 AS id6,
  ((event_id + r) % 5 + 1)::INT                           AS v1,
  ((event_id * 3 + user_id) % 5 + 1)::INT                 AS v2,
  round(value * (r + 1) / {REP}, 6)                       AS v3
FROM read_parquet('{SF}/events.parquet'), range({REP}) t(r)
""")
con.sql("CREATE TEMP TABLE dim_small  AS SELECT DISTINCT id1, length(id1)::DOUBLE AS w1 FROM x")
con.sql("CREATE TEMP TABLE dim_medium AS SELECT DISTINCT id2, length(id2)::DOUBLE AS w2 FROM x")
con.sql("CREATE TEMP TABLE dim_big    AS SELECT DISTINCT id3, length(id3)::DOUBLE AS w3 FROM x")

QUERIES = {
    "g1_sum_by_id1":
        "SELECT id1, sum(v1) AS v1 FROM x GROUP BY id1",
    "g2_sum_by_id1_id2":
        "SELECT id1, id2, sum(v1) AS v1 FROM x GROUP BY id1, id2",
    "g3_sum_mean_by_id3":
        "SELECT id3, sum(v1) AS v1, avg(v3) AS v3 FROM x GROUP BY id3",
    "g4_mean_by_id4":
        "SELECT id4, avg(v1) AS v1, avg(v2) AS v2, avg(v3) AS v3 FROM x GROUP BY id4",
    "g5_sum_by_id6":
        "SELECT id6, sum(v1) AS v1, sum(v2) AS v2, sum(v3) AS v3 FROM x GROUP BY id6",
    "g6_median_sd_by_id4_id5":
        "SELECT id4, id5, median(v3) AS median_v3, stddev(v3) AS sd_v3 "
        "FROM x GROUP BY id4, id5",
    "g7_range_by_id3":
        "SELECT id3, max(v1) - min(v2) AS range_v1_v2 FROM x GROUP BY id3",
    "g8_top2_by_id6":
        "SELECT id6, v3 FROM (SELECT id6, v3, row_number() OVER "
        "(PARTITION BY id6 ORDER BY v3 DESC) AS rn FROM x) WHERE rn <= 2",
    "g9_r2_by_id2_id4":
        "SELECT id2, id4, pow(corr(v1, v2), 2) AS r2 FROM x GROUP BY id2, id4",
    "g10_sum_count_by_id1_6":
        "SELECT id1, id2, id3, id4, id5, id6, sum(v3) AS v3, count(*) AS n "
        "FROM x GROUP BY id1, id2, id3, id4, id5, id6",
    "j_small_on_id1":
        "SELECT x.id1, sum(v1 * w1) AS s FROM x JOIN dim_small USING (id1) GROUP BY x.id1",
    "j_medium_on_id2":
        "SELECT x.id2, sum(v1 * w2) AS s FROM x JOIN dim_medium USING (id2) GROUP BY x.id2",
    "j_big_on_id3":
        "SELECT id4, sum(v3 * w3) AS s FROM x JOIN dim_big USING (id3) GROUP BY id4",
}


def run(name, q):
    # CTAS: full materialization without client transfer (the analog of
    # the Spark side's noop sink)
    t0 = time.perf_counter()
    con.sql(f"CREATE OR REPLACE TEMP TABLE ans AS {q}")
    dt = time.perf_counter() - t0
    rows = con.sql("SELECT count(*) FROM ans").fetchone()[0]
    return dt, rows


rows_out = {}
for name, q in QUERIES.items():  # warmup
    _, rows_out[name] = run(name, q)
timings = {}
for name, q in QUERIES.items():
    timings[name] = statistics.median(
        sorted(run(name, q)[0] for _ in range(ITERS)))
print(json.dumps({
    "metric": "h2o_total_duckdb",
    "value": round(sum(timings.values()), 3),
    "unit": "sec",
    "rows": n_events * REP,
    "queries": {k: round(v, 3) for k, v in timings.items()},
    "out_rows": rows_out,
}))
