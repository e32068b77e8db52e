#!/usr/bin/env python3
"""Time each SparkEntry oracle SQL in DuckDB at a given scale factor —
the single-node throughput baseline the reference doesn't publish
(BASELINE.md). Usage: duckdb_baseline.py <sf_dir> <oracle_sql.json>
"""
import json, sys, time
import duckdb

def main(sf_dir, oracle_path):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(oracle_path) as f:
        oracles = json.load(f)
    times = {}
    for name in sorted(oracles):
        t0 = time.time()
        try:
            con.sql(oracles[name]).fetchall()
            times[name] = round(time.time() - t0, 3)
        except Exception as e:
            times[name] = -1.0
            print(f"  {name}: ERROR {e}", file=sys.stderr)
    total = sum(v for v in times.values() if v > 0)
    print(json.dumps({"metric": "duckdb_total", "value": round(total, 2),
                      "unit": "sec", "queries": times, "sf": sf_dir}))

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
