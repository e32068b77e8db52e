package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Readability scoring and conditional-bigram-entropy semantics —
  * exact counts, NULL guards, the perfectly-predictable-text zero. */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("readability counts words, sentence runs and vowel groups exactly") {
    val df = Seq((1L, "Hello world. This is fun!")).toDF("id", "text")
    val r = TextAnalysis.readability(df, col("id"), col("text")).collect().head
    assert(r.getLong(1) == 5L) // words
    assert(r.getLong(2) == 2L) // "." and "!" runs
    assert(r.getLong(3) == 6L) // he-llo(2) world(1) this(1) is(1) fun(1)
    val flesch = 206.835 - 1.015 * (5.0 / 2.0) - 84.6 * (6.0 / 5.0)
    val fk = 0.39 * (5.0 / 2.0) + 11.8 * (6.0 / 5.0) - 15.59
    assert(math.abs(r.getDouble(4) - flesch) < 1e-12)
    assert(math.abs(r.getDouble(5) - fk) < 1e-12)
  }

  test("readability: consecutive terminators are ONE sentence run; no words or no sentences gives NULL scores") {
    val df = Seq((1L, "Wait... what?! Ok."), (2L, ""), (3L, "no terminator here"))
      .toDF("id", "text")
    val m = TextAnalysis.readability(df, col("id"), col("text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getLong(2) == 3L) // "...", "?!", "."
    assert(m(2L).isNullAt(4) && m(2L).isNullAt(5)) // zero words
    assert(m(3L).isNullAt(4) && m(3L).isNullAt(5)) // zero sentences
  }

  test("bigram entropy is 0 for perfectly predictable transitions, exact for a known mix") {
    val df = Seq((1L, "a b a b a b"), (2L, "a b a c"), (3L, "solo"))
      .toDF("id", "text")
    val out = TextAnalysis.bigramEntropy(df, col("id"), col("text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 1: every a→b, b→a — H = 0; N = 5 bigrams, 2 distinct
    assert(out(1L).getLong(1) == 5L && out(1L).getLong(2) == 2L)
    assert(out(1L).getDouble(3) == 0.0)
    // doc 2: (a,b)(b,a)(a,c) — H = (2/3)·ln 2, each term floor-quantized
    val term = math.floor(1.0 / 3.0 * math.log(2.0) * 1e9)
    assert(out(2L).getDouble(3) == 2 * term / 1e9)
    // doc 3: a single token has no transitions — absent
    assert(!out.contains(3L))
  }

  test("bigram entropy folds case so transition identity matches the term pipeline") {
    val df = Seq((1L, "The the THE tHe")).toDF("id", "text")
    val r = TextAnalysis.bigramEntropy(df, col("id"), col("text")).collect().head
    assert(r.getLong(2) == 1L) // one distinct folded bigram (the,the)
    assert(r.getDouble(3) == 0.0)
  }
}
