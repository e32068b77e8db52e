#!/usr/bin/env python3
"""Build an ADVERSARIAL documents corpus at <out_dir> (other tables are
copied from sf0.001): capitalized stopwords/markers, mixed case, docs
shorter than the shingle width, empty text, repetitive shingles — the
triggers the driver's synthetic corpus lacks. Running the verify gate
against it proves the Spark/DuckDB oracle pairs share semantics instead
of passing by corpus luck (round-2 ADVICE found two such latent splits;
round 3 found three more this way: lang-id/fingerprint case folding,
DuckDB array_to_string([])→NULL, empty-signature band collisions).

Usage: advdata.py [out_dir]   # then: bash tools/verify.sh <out_dir> /tmp/vout_adv
"""
import shutil
import sys

import duckdb

def main(out_dir):
    con = duckdb.connect()
    rows = [
        (0, "The Cat AND the hat IS on THE mat", "en", "web", 33),
        (1, "Der Hund UND die Katze IST hier", "de", "web", 31),
        (2, "a b", "en", "web", 3),                       # < shingle width
        (3, "", "en", "pdf", 0),                          # empty
        (4, "x y z x y z x y z x y z", "en", "pdf", 23),  # repetitive
        (5, "El Perro Y LA Casa QUE es GRANDE", "es", "web", 32),
        (6, "Le chat ET LES chiens EST ici", "fr", "books", 29),
        (7, "MiXeD CaSe ToKeNs MiXeD CaSe", "en", "books", 28),
    ]
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR,"
                " source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO d VALUES (?,?,?,?,?)", rows)
    con.execute(f"COPY d TO '{out_dir}/documents.parquet' (FORMAT PARQUET)")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "embeddings"]:
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", f"{out_dir}/{t}.parquet")
    print(f"adversarial corpus at {out_dir}")

if __name__ == "__main__":
    import os
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/advdata"
    os.makedirs(out, exist_ok=True)
    main(out)
