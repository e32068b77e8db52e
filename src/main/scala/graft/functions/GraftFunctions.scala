package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level function library (SURVEY.md §2.4 "scalar functions",
  * §7.3).
  *
  * The reference's function surface is "any Clojure fn inside map/filter"
  * (reference: src/kafka_streams_clojure/api.clj:157-159) — a UDF-only
  * model. Engine policy is the reverse: everything here composes BUILT-IN
  * `org.apache.spark.sql.functions` (whole-stage-codegen'd, pushdown-safe)
  * and is deliberately reproducible in ANSI-ish SQL so every operator has
  * a DuckDB oracle twin.
  */
object GraftFunctions {

  /** Deterministic 60-bit hash of a string column: the first 15 hex digits
    * of md5, as a non-negative BIGINT. Chosen over murmur/xxhash because
    * md5 is identically available in DuckDB (oracle parity) and 60 bits
    * avoids sign issues. Salted variants give the independent hash
    * families MinHash/SimHash/LSH need. */
  def md5Long(c: Column, salt: Int = 0): Column = {
    val salted = if (salt == 0) c else concat(lit(salt.toString + "|"), c)
    conv(substring(md5(salted), 1, 15), 16, 10).cast("long")
  }

  /** Whitespace tokenizer — the shared token basis for text analysis,
    * shingles, SimHash. Drops empty tokens. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => length(t) > 0)

  /** Word w-shingles: overlapping windows of `w` tokens joined by a
    * space. Empty array when the document has fewer than `w` tokens. */
  def shingles(text: Column, w: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= w,
      transform(sequence(lit(0), size(toks) - w),
        i => array_join(slice(toks, i + 1, lit(w)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** MinHash signature: k independent permutation-mins over the element
    * hashes of `arr` (strings). hash_i(x) = min over elements of
    * md5Long(i-salted element). Null-safe: empty arrays give Long.Max. */
  def minhashSignature(arr: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), i => {
      // per-salt min over the array; salt folded into the md5 input
      array_min(transform(arr, e =>
        conv(substring(md5(concat(cast_str(i), lit("|"), e)), 1, 15), 16, 10).cast("long")))
    })

  private def cast_str(c: Column): Column = c.cast("string")

  /** LSH band keys from a MinHash signature: split the k-length signature
    * into `bands` contiguous groups and hash each group to one string key.
    * Two documents sharing ANY band key are near-dup candidates. */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      concat_ws("_", cast_str(b),
        md5(array_join(transform(slice(signature, b * rowsPerBand + 1, lit(rowsPerBand)), v => cast_str(v)), ","))))

  /** 32-bit SimHash over the tokens of `text`: bit b is set iff the sum of
    * (+1 / -1) over tokens' hash-bit-b values is positive. Returns BIGINT. */
  def simhash32(text: Column): Column = simhashImpl(tokens(text))

  private def simhashImpl(toks: Column): Column =
    aggregate(
      sequence(lit(0), lit(31)),
      lit(0L),
      (acc, b) => {
        val bitSum = aggregate(toks, lit(0L), (a, t) =>
          a + when(call_function("shiftrightunsigned", md5Long(t), b).bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L)))
        acc + when(bitSum > 0, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))
      })

  /** Hamming distance between two BIGINT bit-sets (for SimHash near-dup). */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("int")

  /** n-gram Jaccard similarity between two token-set columns:
    * |A ∩ B| / |A ∪ B| as DOUBLE (0 when both empty). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0, lit(0.0)).otherwise(inter / union)
  }

  /** Dot product of two numeric array columns, accumulated in DOUBLE in
    * index order (bit-reproducible in the DuckDB oracle). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm in DOUBLE. */
  def l2norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** Cosine similarity of two array<float|double> columns, computed in
    * DOUBLE, index order. 0 when either norm is 0. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = l2norm(a) * l2norm(b)
    when(n === 0, lit(0.0)).otherwise(d / n)
  }

  /** Rolling polynomial (Karp–Rabin) fingerprint over tokens:
    * h = (h*31 + (md5Long(token) mod p)) mod p with p = 1e9+7, in token
    * order. The per-step mod keeps every intermediate < 2^35 — no silent
    * Java-long wraparound, so the identical SQL is exact in the oracle. */
  def rollingFingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => pmod(acc * 31 + pmod(md5Long(t), lit(1000000007L)), lit(1000000007L)))
}
