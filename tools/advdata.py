#!/usr/bin/env python3
"""Build an ADVERSARIAL corpus at <out_dir> (remaining tables are copied
from sf0.001): the triggers the driver's synthetic corpus lacks.

documents: capitalized stopwords/markers, mixed case, docs shorter than
the shingle width, empty text, repetitive shingles.
events: ordering ties on (user, ts), NULL event_type/value/props/user,
digit-less and malformed-JSON props, exact threshold values (150, 100),
a user whose values sum to zero, an event type outside the pivot list.

Running the verify gate against this corpus proves the Spark/DuckDB
oracle pairs share semantics instead of passing by corpus luck. Round-2
ADVICE found two such latent splits; this corpus found seven more:
lang-id/fingerprint case folding, DuckDB array_to_string([])→NULL,
empty-signature band collisions, malformed-JSON extraction, safeFlatMap
drop-vs-NULL rows, aggregate-vs-list_sum null poisoning, ASC null
ordering in windows, and Spark-ANSI divide-by-zero vs DuckDB NULL.

Usage: advdata.py [out_dir]   # then: bash tools/verify.sh <out_dir> /tmp/vout_adv
"""
import datetime as dt
import shutil
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

def write_documents(out_dir):
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
        # non-ASCII: UTF-8 multi-byte chars make octet_length != length —
        # forces the media oracles (resize/frames/meta) to be BYTE-based;
        # a char-based oracle passes on ASCII by corpus luck (r3 ADVICE)
        (8, "Über die Straße — ein größer Fluß und naïve café im Büro", "de", "web", 56),
        # DECOMPOSED Unicode (e + combining acute, a + combining ring,
        # plus a tab control char): NFC normalization must recompose these
        # identically in Spark (java.text.Normalizer) and DuckDB
        # (utf8proc) — a precomposed-only corpus never exercises the
        # normalizer's actual work
        (9, "Cafe\u0301 cre\u0300me a\u030aThe END\t", "fr", "web", 23),
        # U+0130 '\u0130': Java FULL lowercase expands it to i+U+0307 (len 2)
        # while DuckDB's utf8proc SIMPLE-maps it to 'i' (len 1) \u2014 the one
        # lowercase mapping where the engines' lower() disagree (r4
        # ADVICE). "\u0130N" also lands on a stopword only after the fold.
        (10, "\u0130stanbul \u0130N THE \u0130stanbul office", "tr", "web", 31),
        # decomposed twin of doc 10 (I + combining dot above): NFC must
        # recompose it to \u0130 and normalized dedup must collapse 10 and 11
        (11, "I\u0307stanbul I\u0307N THE I\u0307stanbul office", "tr", "web", 34),
        # word-final \u03a3: Java's contextual Final_Sigma lowers it to '\u03c2',
        # utf8proc always gives '\u03c3' \u2014 the second divergent mapping
        (12, "\u039f\u0394\u03a5\u03a3\u03a3\u0395\u03a5\u03a3 \u039a\u0391\u0399 \u0397 \u0398\u0391\u039b\u0391\u03a3\u03a3\u0391 \u0395\u03a3 \u03a3\u039f\u03a6\u039f\u03a3", "el", "web", 31),
        # --- PLANTED CONTAMINATION at production n-gram width (w=8) ---
        # bench doc 97 (97 % 97 == 0 \u2192 the benchmark slice) carries a
        # 10-token QA span; train doc 13 embeds it VERBATIM (3 shared
        # 8-grams \u2192 q_contam_span reports span_len 10), train doc 14
        # paraphrases it (many shared tokens, ZERO shared 8-grams).
        # q_contam_w8 / q_contam_span must flag 13 and only 13 \u2014 the
        # driver corpus has no w\u22655 overlap, so this is the only executed
        # positive at production width.
        (97, "what is the capital of france the answer is paris", "en", "bench", 49),
        (13, "leaked prefix what is the capital of france the answer is paris and suffix", "en", "web", 74),
        (14, "the capital city of france is named paris as the answer states", "en", "web", 62),
        # --- PLANTED LINE BOILERPLATE (q_line_dedup, maxDocs=2) ---
        # "home | about | contact" recurs in docs 15/16/17/18 (>2 docs →
        # dropped); "copyright 2024 example" is in exactly 2 docs (the
        # threshold boundary → KEPT); docs 15-17 end with a trailing
        # newline, so the empty line also hits 3 docs and is dropped
        # (string_split trailing-empty parity). Doc 18 is ALL boilerplate
        # (nav bar twice → within-doc dup counted once, clean_text = '').
        (15, "home | about | contact\nunique fifteen content here\ncopyright 2024 example\n", "en", "web", 0),
        (16, "copyright 2024 example\nhome | about | contact\nsixteen body line\n", "en", "web", 0),
        (17, "seventeen opening line\nhome | about | contact\nseventeen closing line\n", "en", "web", 0),
        (18, "home | about | contact\nhome | about | contact", "en", "web", 0),
        # --- GOPHER RULE-PACK BOUNDARIES (q_quality_rules) ---
        # 23: duplicated PARAGRAPHS whose individual lines also repeat —
        # dup_para_frac 2/4, and the para split ('\n\n') must not be
        # confused with the line split; 24: heavy 2-gram repetition where
        # the top 3-gram differs from the top 2-gram and ties exist at
        # w=2 ('x y' vs 'y x' both 4x -> longer/equal len tie-break)
        (23, "para one\n\npara two\n\npara one\n\npara one", "en", "web", 0),
        (24, "x y x y x y x y z q z q", "en", "web", 0),
        # --- PLANTED PII (q_pii_scrub) ---
        (19, "reach john.doe@example.com or jane_smith+tag@mail.co for info", "en", "web", 0),
        (20, "call 555-123-4567 or 555.987.6543 now", "en", "web", 0),
        (21, "ping 192.168.1.1 then 10.0.0.255 fails", "en", "web", 0),
        # collision traps: "10.20.30.4055" is neither a 3-3-4 phone nor a
        # clean IP (the IP match stops at 405, leaving a trailing 5);
        # "192.168.100.2000" IS claimed by the PHONE pass (leftmost match
        # 168.100.2000) before the IP pass ever sees it — proves the two
        # engines agree on pass ORDER, not just per-pattern spans
        (22, "ip 10.20.30.4055 mail x1@y2.org at 127.0.0.1 and 192.168.100.2000", "en", "web", 0),
        # --- C4 LINE-CLEANING BOUNDARIES (q_c4_clean) ---
        # 25: a SURVIVOR — five kept sentences (exactly the minimum),
        # one line dropped for no terminal punct, one dropped as a
        # 2-word line, one dropped for 'JavaScript' (case-folded), and
        # a trailing-space line that only passes because rtrim runs
        # before the terminal-punct check
        (25, "This page has real sentences. It keeps enough of them! "
             "Does it pass? Yes it does. Final sentence here. \n"
             "no terminal punctuation line\n"
             "Two words.\n"
             "Enable JavaScript to continue.\n"
             "Trailing space sentence stays. ", "en", "web", 0),
        # 26: four sentence marks after cleaning → page gate rejects
        # (boundary: one below the 5-sentence minimum)
        (26, "One good sentence. Two good sentences! Three good ones? "
             "And a fourth one.", "en", "web", 0),
        # 27/28: page poisons — lorem ipsum (case-folded) and a curly
        # brace inside otherwise-clean text
        (27, "Proper sentence one. Lorem Ipsum dolor sit amet here. "
             "Three more words follow. Four in this one. Five to finish.",
         "en", "web", 0),
        (28, "Valid sentence one. Object literal {like this} appears. "
             "Three more words here. Keep counting to four. Five closes it.",
         "en", "web", 0),
        # --- NULL TEXT (r13 ADVICE): the dataset card distinguishes
        # n_docs vs n_text_docs, so the schema explicitly allows a
        # NULL-text row — every score/label oracle must filter it the
        # way its Spark twin does (q_calibration_bins was the latent
        # split). NULL n_chars rides along (NULL len_bucket QI class).
        (30, None, "en", "pdf", None),
        # --- PERCEPTUAL dHash TWINS (q_phash_pairs, r13 ADVICE) ---
        # ids 31/35 are both %4==3 (headerless payload → identical
        # container layout), texts are EXACTLY 72 bytes (the dHash grid
        # samples every byte once at n=72) and differ in ONE byte at
        # offset 50: 'a'(0x61)→'~'(0x7E) inverts BOTH neighbor
        # comparisons (h>a TRUE→h>~ FALSE, a>t FALSE→~>t TRUE) —
        # hamming exactly 2 ≤ 3, so the pair exercises the tolerance
        # path (not just hash equality) and ≥1 of the 4 bands still
        # matches exactly (pigeonhole). Without this pair the banded
        # hamming join passes on honest 0 rows and a broken band join
        # is invisible at driver level.
        (31, "perceptual twin payload body with steady bytes that fill the sample grid", "en", "web", 0),
        (35, "perceptual twin payload body with steady bytes th~t fill the sample grid", "en", "web", 0),
        # --- PLANTED CANARY (q_canary_scan): canary 0 verbatim — the
        # memorization probe must flag exactly this doc (the driver
        # corpus plants none, so this is the only executed positive)
        (33, "leaked model output contains GRAFT-CANARY-7Q4-ZEBRA verbatim here", "en", "web", 0),
        # --- NULL GROUPING KEYS (r15): lang and source are GROUP
        # columns in a dozen queries (dp_release, unimax, domain
        # cap/reweight, stratified sample, duels, js_sources...) — a
        # NULL group exercises every NULL-group parity class at once:
        # GROUP BY NULL keeps one NULL group in both engines, window
        # ORDER BY must agree on NULLS LAST, and hash sentinels must
        # replay (the dp_release 'V'/'N' marker). Text is valid so the
        # row flows through quality/token paths, not the NULL-text arm.
        (36, "a perfectly ordinary document whose language and source are unknown.", None, None, 0),
        # --- ENCODING DAMAGE (q_mojibake_scan, r15): C0 controls
        # (binary spill — \x01\x02; tab/LF/CR stay exempt) and U+FFFD
        # replacement chars (decoder already gave up) — the driver
        # corpus is clean, so these are the only executed positives
        (37, "truncated pdf spill \x01\x02 mid text", "en", "pdf", 0),
        (38, "decoder gave up �� right here", "en", "web", 0),
        # --- NULL doc_id (r15): the id is the tiebreak key of dozens
        # of windows and the residue key of every slice predicate —
        # NULL must order/slice identically on both engines (NULL % k
        # is NULL → out of every residue slice; window tiebreaks must
        # agree on NULL placement)
        (None, "an orphan row whose identifier was lost upstream.", "en", "web", 0),
    ]
    # keep n_chars honest for the new rows (oracle-side len() parity)
    rows = [(i, t, l, s, len(t) if n == 0 and (i is None or i >= 15) else n)
            for (i, t, l, s, n) in rows]
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR,"
                " source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO d VALUES (?,?,?,?,?)", rows)
    con.execute(f"COPY d TO '{out_dir}/documents.parquet' (FORMAT PARQUET)")

def write_events(out_dir):
    # pyarrow, not DuckDB COPY: the real events.parquet is TIMESTAMP(NANOS)
    # (which exercises the Tables.events nanosAsLong path) and DuckDB
    # silently writes micros
    def t(m):
        return dt.datetime(2024, 1, 1, 0, m, 0)
    rows = [
        (0, t(1), 1, "click", 10.0, '{"k": 1}'),
        (1, t(1), 1, "click", 20.0, '{"k": 2}'),        # tie on (user, ts)
        (2, t(2), 1, None, 30.0, '{"k": 3}'),           # NULL type
        (3, t(3), 1, "view", None, '{"k": 4}'),         # NULL value
        (4, t(4), 1, "view", 40.0, None),               # NULL props
        (5, t(5), 2, "view", 50.0, 'no digits here'),
        (6, t(6), 2, "click", 60.0, '{broken'),         # malformed JSON
        (7, t(7), 2, "purchase", 150.0, '{"k": 7}'),    # take_while edge
        (8, t(8), 2, "purchase", 100.0, '{"k": 8}'),    # branch edge
        (9, t(9), 3, "click", 5.0, '{"k": 9}'),
        (10, t(10), 3, "click", -5.0, '{"k": 10}'),     # user 3 sums to 0
        (11, t(11), 4, "weird", 1.0, '{"k": 11}'),      # outside pivot list
        (12, t(12), None, "click", 2.0, '{"k": 12}'),   # NULL user
        (13, t(13), 4, "error", 3.0, '{"k": 13}'),
        (14, t(14), 4, "error", 4.0, None),
        (15, t(15), 5, "view", 1.0, '{"k": 15}'),
        (16, t(16), 5, "view", 2.0, '{"k": 16}'),
        (17, t(17), 5, "click", 3.0, '{"k": 17}'),
        (18, t(18), 5, "view", 4.0, '{"k": 18}'),
        # far-future junk timestamp (year 2255): without the resample
        # grid clamp this single row explodes user 5's hourly grid into
        # ~2M buckets; with the clamp (mirrored in the oracle) the grid
        # stops at b0+99999 and the row only serves as a lerp neighbor
        (19, dt.datetime(2255, 6, 1, 0, 0, 0), 5, "view", 9.0, '{"k": 19}'),
        # NULL event_id TIED on (user, ts) with event 0/1 (r15): the id
        # is the tiebreak key of every event-ordering window — NULL
        # placement must agree across engines (the doc_id orphan class)
        (None, t(1), 1, "view", 15.0, '{"k": 20}'),
        # NON-FINITE metric values (r16, VERDICT item 3): the seam guard
        # must QUARANTINE these — a NaN/±Inf value otherwise poisons
        # every SUM it touches and hits the floor(x·10⁶) quantizations
        # (Inference/RobustStats) where Spark's non-ANSI cast saturates
        # but DuckDB raises. ids chosen inside user 1/2's streaks so the
        # drop provably reshapes windows/takeWhile the same way on both
        # engines; NULL value (event 3) stays KEPT.
        (21, t(2), 1, "click", float("nan"), '{"k": 21}'),
        (22, t(6), 2, "view", float("inf"), '{"k": 22}'),
        (23, t(7), 2, "purchase", float("-inf"), '{"k": 23}'),
    ]
    cols = list(zip(*rows))
    tbl = pa.table({
        "event_id": pa.array(cols[0], pa.int64()),
        "ts": pa.array(cols[1], pa.timestamp("ns")),
        "user_id": pa.array(cols[2], pa.int64()),
        "event_type": pa.array(cols[3], pa.string()),
        "value": pa.array(cols[4], pa.float64()),
        "props": pa.array(cols[5], pa.string()),
    })
    pq.write_table(tbl, f"{out_dir}/events.parquet", version="2.6")

def write_embeddings(out_dir):
    # dim 8 (NOT the production 64): stresses every dim-adaptive path —
    # LSH plane slicing, centroid explode, cosine loops. id 5 is the zero
    # vector (zero-norm cosine guard). ids 0..19 cover the fixed probe ids
    # (query 0, knn queries <3, ivf centroids <16).
    vecs = []
    for i in range(20):
        if i == 5:
            v = [0.0] * 8
        else:
            v = [((i * 31 + j * 17) % 13 - 6) / 7.0 for j in range(8)]
        vecs.append(v)
    # label mirrors the production schema (labelSeparation consumes it):
    # NULL label (dropped row), a singleton label (cohesion over one
    # member), and two regular classes — incl. the zero vector in class 0
    labels = [None if i == 7 else (9 if i == 8 else i % 2)
              for i in range(20)]
    # --- NON-FINITE VECTORS (r14 VERDICT item 1): the ingest guard
    # must QUARANTINE (drop) these instead of crashing the quantized-
    # cosine paths. 20 is %4==0 (a contrastive anchor id — proves the
    # guard runs before anchor selection), 21/22 cover both
    # infinities, 23 has a NULL element (non-dense vector — equally
    # malformed, equally dropped; q_embed_quarantine pins all four).
    vecs += [[float("nan") if j == 3 else 0.5 for j in range(8)],
             [float("inf") if j == 0 else 0.25 for j in range(8)],
             [float("-inf") if j == 7 else -0.25 for j in range(8)],
             [None if j == 2 else 0.125 for j in range(8)]]
    labels += [0, 1, 0, 1]
    tbl = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int64()),
    })
    pq.write_table(tbl, f"{out_dir}/embeddings.parquet", version="2.6")

def write_lineitem(out_dir):
    # constant-quantity group (variance→tiny-negative hazard), negative
    # quantity (sqrt guard), NULL quantity/flag, zero-price rows
    con = duckdb.connect()
    con.execute("""CREATE TABLE l (l_orderkey BIGINT, l_partkey BIGINT,
        l_suppkey BIGINT, l_linenumber INTEGER, l_quantity DOUBLE,
        l_extendedprice DOUBLE, l_discount DOUBLE, l_tax DOUBLE,
        l_returnflag VARCHAR, l_linestatus VARCHAR, l_shipdate TIMESTAMP)""")
    rows = [
        # group 'C': constant quantity → variance must clamp at 0
        (1, 1, 1, 1, 7.0, 100.0, 0.05, 0.01, "C", "O", "1995-01-01"),
        (1, 2, 1, 2, 7.0, 200.0, 0.00, 0.02, "C", "O", "1995-02-01"),
        (2, 3, 2, 1, 7.0, 300.0, 0.10, 0.00, "C", "F", "1995-03-01"),
        # group 'N': negative + NULL quantity, zero price
        (3, 4, 2, 1, -4.0, 0.0, 0.00, 0.00, "N", "O", "1996-01-01"),
        (3, 5, 3, 2, None, 50.0, 0.02, 0.01, "N", "O", "1996-02-01"),
        (4, 6, 3, 1, 46.0, 75.0, 0.07, 0.03, "N", "F", "1994-12-31"),
        # NULL returnflag group
        (5, 7, 4, 1, 10.0, 10.0, 0.01, 0.00, None, "O", "1997-06-15"),
        # NON-FINITE metrics (r16): quarantined at the seam — NaN
        # quantity inside group 'C' (would un-constant its variance
        # clamp if kept) and +Inf price on its own key
        (6, 8, 4, 1, float("nan"), 20.0, 0.01, 0.00, "C", "O", "1997-07-01"),
        (7, 9, 4, 1, 5.0, float("inf"), 0.02, 0.01, "N", "F", "1997-08-01"),
    ]
    con.executemany("INSERT INTO l VALUES (?,?,?,?,?,?,?,?,?,?,?)", rows)
    con.execute(f"COPY l TO '{out_dir}/lineitem.parquet' (FORMAT PARQUET)")

def write_orders(out_dir):
    # NULL order date with the HIGHEST orderkey on a joined key (the as-of
    # join must never pick it), NULL custkey, NULL totalprice
    con = duckdb.connect()
    con.execute("""CREATE TABLE o (o_orderkey BIGINT, o_custkey BIGINT,
        o_orderstatus VARCHAR, o_totalprice DOUBLE, o_orderdate TIMESTAMP,
        o_orderpriority VARCHAR)""")
    rows = [
        (1, 1, "O", 100.0, "1995-06-01", "1-URGENT"),
        (2, 1, "F", 200.0, "1996-06-01", "2-HIGH"),
        (99, 1, "O", 999.0, None, "3-MEDIUM"),         # NULL date, top key
        (3, 2, "O", None, "1997-01-01", "4-NOT SPECIFIED"),
        (4, None, "F", 50.0, "1998-01-01", "5-LOW"),   # NULL custkey
        (5, 3, "P", 75.0, "1994-01-01", "1-URGENT"),
        # NaN totalprice (r16): quarantined at the seam; NULL (key 3)
        # stays KEPT — the guard must distinguish the two states
        (6, 2, "O", float("nan"), "1997-02-01", "2-HIGH"),
    ]
    con.executemany("INSERT INTO o VALUES (?,?,?,?,?,?)", rows)
    con.execute(f"COPY o TO '{out_dir}/orders.parquet' (FORMAT PARQUET)")

def write_customer(out_dir):
    # sf0.001 customer + NULL-block-key rows (r14 ADVICE item 2): the
    # FS-linkage engine must DROP records whose block tuple has a NULL
    # (the oracle's equi-join does so implicitly); without these rows a
    # groupBy that coalesces NULL blocks into one real block passes on
    # corpus luck.  150: NULL nationkey; 151: NULL acctbal (NULL acct_k
    # AND NULL cent agreement field); 152/153: a live same-block pair
    # so the filter provably removes only the NULL-key rows.
    con = duckdb.connect()
    con.execute("CREATE TABLE c AS SELECT * FROM "
                f"'/root/testdata/sf0.001/customer.parquet'")
    con.executemany("INSERT INTO c VALUES (?,?,?,?,?)", [
        (150, "Customer#000000150", None, 1234.56, "BUILDING"),
        (151, "Customer#000000151", 3, None, "MACHINERY"),
        (152, "Customer#000000152", 3, 2500.10, "MACHINERY"),
        (153, "Customer#000000153", 3, 2500.10, "MACHINERY"),
        # ±Inf acctbal (r16): quarantined at the seam before the FS
        # cents-agreement quantization ever sees it
        (154, "Customer#000000154", 3, float("inf"), "MACHINERY"),
        (155, "Customer#000000155", 3, float("-inf"), "BUILDING"),
    ])
    con.execute(f"COPY c TO '{out_dir}/customer.parquet' (FORMAT PARQUET)")


def write_part_supplier(out_dir):
    # sf0.001 part/supplier + non-finite retail-price/acctbal rows
    # (r16): the metric seam guard must drop them on BOTH engines
    con = duckdb.connect()
    con.execute("CREATE TABLE p AS SELECT * FROM "
                f"'/root/testdata/sf0.001/part.parquet'")
    con.execute("INSERT INTO p SELECT (SELECT max(p_partkey) + 1 FROM p), "
                "'nan trap part', 'Brand#99', 'TRAP TYPE', 1, 'nan'::DOUBLE")
    con.execute(f"COPY p TO '{out_dir}/part.parquet' (FORMAT PARQUET)")
    con.execute("CREATE TABLE s AS SELECT * FROM "
                f"'/root/testdata/sf0.001/supplier.parquet'")
    con.execute("INSERT INTO s SELECT (SELECT max(s_suppkey) + 1 FROM s), "
                "'inf trap supp', 0, '-inf'::DOUBLE")
    con.execute(f"COPY s TO '{out_dir}/supplier.parquet' (FORMAT PARQUET)")

def main(out_dir):
    write_documents(out_dir)
    write_events(out_dir)
    write_embeddings(out_dir)
    write_lineitem(out_dir)
    write_orders(out_dir)
    write_customer(out_dir)
    write_part_supplier(out_dir)
    for t in ["region", "nation"]:
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", f"{out_dir}/{t}.parquet")
    print(f"adversarial corpus at {out_dir}")

if __name__ == "__main__":
    import os
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/advdata"
    os.makedirs(out, exist_ok=True)
    main(out)
