#!/usr/bin/env python3
"""Generate a 10x scale-rehearsal corpus at benchdata/sf1 from the
driver's read-only sf0.1 tables (which must NOT be modified).

Replication discipline (deterministic, no RNG):
- keys shift by replica * 10^9 so cardinalities scale with the data
  (10x users, docs, orders — NOT 10x rows per key, which would test
  skew, not scale);
- document text is word-ROTATED per replica (rotate by 7*replica+1)
  with a replica marker appended, so shingle/minhash/simhash content
  differs across replicas — a corpus of 10x verbatim duplicates would
  blow up every dedup query's candidate generation and measure an
  adversarial workload, not a scaled one;
- embeddings get a per-(replica, dim) deterministic perturbation so
  ANN buckets/cells spread instead of collapsing into 10-way ties;
  vec_id 0 (the query vector) exists only in replica 0;
- events shift ts by replica minutes so windows/sessions grow in span
  and the (user, ts) ordering stays tie-free.

Output is for LOCAL bench rehearsal only (benchdata/ is gitignored).
Usage: python3 tools/gen_sf1.py [out_dir] [replicas]
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/benchdata/sf1"
R = int(sys.argv[2]) if len(sys.argv) > 2 else 10
SHIFT = 10 ** 9

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
con.execute("SET threads TO 16")


def gen(table, sql):
    out = f"{OUT}/{table}.parquet"
    con.execute(
        f"COPY ({sql}) TO '{out}' (FORMAT PARQUET, COMPRESSION SNAPPY)")
    n = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
    print(f"{table}: {n} rows")


reps = " UNION ALL ".join(f"SELECT {i} AS rep" for i in range(R))
con.execute(f"CREATE VIEW reps AS {reps}")

# documents: rotate words by (7*rep+1) mod n_words, append a marker token
gen("documents", f"""
  WITH src AS (SELECT * FROM '{SRC}/documents.parquet'),
  w AS (SELECT doc_id, lang, source,
               string_split(text, ' ') AS ws, len(string_split(text, ' ')) AS nw
        FROM src)
  SELECT s.doc_id + r.rep * CAST({SHIFT} AS BIGINT) AS doc_id,
         CASE WHEN r.rep = 0 THEN s.text
              ELSE array_to_string(
                     list_concat(w.ws[((7 * r.rep + 1) % greatest(w.nw, 1)) + 1 :],
                                 w.ws[1 : ((7 * r.rep + 1) % greatest(w.nw, 1))]),
                     ' ') || ' rep' || r.rep
         END AS text,
         s.lang, s.source,
         CASE WHEN r.rep = 0 THEN s.n_chars
              ELSE len(array_to_string(
                     list_concat(w.ws[((7 * r.rep + 1) % greatest(w.nw, 1)) + 1 :],
                                 w.ws[1 : ((7 * r.rep + 1) % greatest(w.nw, 1))]),
                     ' ') || ' rep' || r.rep)
         END AS n_chars
  FROM src s JOIN w ON s.doc_id = w.doc_id CROSS JOIN reps r
""")

# embeddings: deterministic per-(rep, dim) perturbation; vec 0 only in rep 0
gen("embeddings", f"""
  WITH src AS (SELECT * FROM '{SRC}/embeddings.parquet')
  SELECT vec_id + rep * CAST({SHIFT} AS BIGINT) AS vec_id,
         CASE WHEN rep = 0 THEN embedding
              ELSE list_transform(
                     list_zip(embedding,
                              range(1, len(embedding) + 1)),
                     p -> CAST(p[1] * (1.0 + 0.003 * rep)
                               + 0.001 * ((rep * 31 + CAST(p[2] AS INT) * 7) % 13 - 6)
                               AS FLOAT))
         END AS embedding,
         label
  FROM src CROSS JOIN reps
  WHERE NOT (rep > 0 AND vec_id = 0)
""")

# events: shift ids/users/ts per replica (10x users, 10x events)
gen("events", f"""
  SELECT event_id + rep * CAST({SHIFT} AS BIGINT) AS event_id,
         ts + INTERVAL (rep) MINUTE AS ts,
         user_id + rep * CAST({SHIFT} AS BIGINT) AS user_id,
         event_type, value, props
  FROM '{SRC}/events.parquet' CROSS JOIN reps
""")

# star schema: scale the fact tables; keys shift so FKs stay consistent
gen("lineitem", f"""
  SELECT l_orderkey + rep * CAST({SHIFT} AS BIGINT) AS l_orderkey,
         l_partkey + rep * CAST({SHIFT} AS BIGINT) AS l_partkey,
         l_suppkey + rep * CAST({SHIFT} AS BIGINT) AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus,
         l_shipdate + INTERVAL (rep) MINUTE AS l_shipdate
  FROM '{SRC}/lineitem.parquet' CROSS JOIN reps
""")
gen("orders", f"""
  SELECT o_orderkey + rep * CAST({SHIFT} AS BIGINT) AS o_orderkey,
         o_custkey + rep * CAST({SHIFT} AS BIGINT) AS o_custkey,
         COLUMNS(* EXCLUDE (o_orderkey, o_custkey))
  FROM '{SRC}/orders.parquet' CROSS JOIN reps
""")
gen("customer", f"""
  SELECT c_custkey + rep * CAST({SHIFT} AS BIGINT) AS c_custkey,
         COLUMNS(* EXCLUDE (c_custkey))
  FROM '{SRC}/customer.parquet' CROSS JOIN reps
""")
gen("supplier", f"""
  SELECT s_suppkey + rep * CAST({SHIFT} AS BIGINT) AS s_suppkey,
         COLUMNS(* EXCLUDE (s_suppkey))
  FROM '{SRC}/supplier.parquet' CROSS JOIN reps
""")
gen("part", f"""
  SELECT p_partkey + rep * CAST({SHIFT} AS BIGINT) AS p_partkey,
         COLUMNS(* EXCLUDE (p_partkey))
  FROM '{SRC}/part.parquet' CROSS JOIN reps
""")
# dimension tables stay as-is (region/nation are fixed-size by nature)
for t in ("region", "nation"):
    gen(t, f"SELECT * FROM '{SRC}/{t}.parquet'")
print("done ->", OUT)
