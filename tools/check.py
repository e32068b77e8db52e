#!/usr/bin/env python3
"""DuckDB-oracle compare for graft.Verify output — local stand-in for the
driver's t2 correctness gate. For each query: load the Spark parquet and
the oracle SQL result, sort columns by name, canonicalize values, sort
rows, compare.
"""
import json, math, os, sys
import duckdb

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr of the double — exact compare, both engines computed in double
        return repr(v)
    if isinstance(v, bytes):
        return "0x" + v.hex()
    return str(v)

def table_of(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_noora = 0
    # crashed queries leave an `err` sentinel parquet (and an errors.json
    # entry) — count them as failures here and skip the value compare, so
    # a crash can never masquerade as green OR as a mere value mismatch
    # (round 9: 41 crashed queries silently vanished from the report)
    errs = {}
    err_path = os.path.join(out_dir, "errors.json")
    if os.path.exists(err_path):
        with open(err_path) as f:
            errs = json.load(f)
    for name, msg in sorted(errs.items()):
        n_fail += 1
        print(f"  ✗ {name}: CRASHED: {msg[:200]}")
    names = [n for n in names if n not in errs]
    for name in names:
        spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        s_cols = [c for c in spark_rel.columns]
        s_rows = spark_rel.fetchall()
        if name not in oracles:
            n_noora += 1
            print(f"  ~ {name}: no oracle (rows={len(s_rows)})")
            continue
        try:
            o_rel = con.sql(oracles[name])
            o_cols = [c for c in o_rel.columns]
            o_rows = o_rel.fetchall()
        except Exception as e:
            n_fail += 1
            print(f"  ✗ {name}: ORACLE SQL ERROR: {e}")
            continue
        if sorted(s_cols) != sorted(o_cols):
            n_fail += 1
            print(f"  ✗ {name}: column mismatch spark={sorted(s_cols)} oracle={sorted(o_cols)}")
            continue
        # The driver's compare path goes through pandas, where DuckDB
        # HUGEINT/DECIMAL become float64/object and hash differently from
        # Spark's int64 even when values are equal (bit q_map_fns in r2).
        # fetchall() hides that, so lint the oracle result types.
        risky = [c for c, t in zip(o_cols, o_rel.types)
                 if str(t) in ("HUGEINT", "UHUGEINT") or str(t).startswith("DECIMAL")]
        if risky:
            n_fail += 1
            print(f"  ✗ {name}: oracle emits pandas-lossy types {risky} — CAST them (BIGINT/DOUBLE)")
            continue
        st, ot = table_of(s_rows, s_cols), table_of(o_rows, o_cols)
        if st == ot:
            n_pass += 1
            print(f"  ✓ {name} ({len(st)} rows)")
        else:
            n_fail += 1
            print(f"  ✗ {name}: VALUE mismatch spark_rows={len(st)} oracle_rows={len(ot)}")
            sset, oset = set(st), set(ot)
            for r in list(sset - oset)[:3]:
                print(f"      spark-only:  {r}")
            for r in list(oset - sset)[:3]:
                print(f"      oracle-only: {r}")
    print(f"PASS={n_pass} FAIL={n_fail} NO_ORACLE={n_noora} "
          f"TOTAL={len(names) + len(errs)}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
