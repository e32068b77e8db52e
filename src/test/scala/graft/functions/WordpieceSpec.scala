package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the greedy longest-match automaton in [[WordpieceStats]] —
  * direct build() cases plus a DataFrame pass through the codegen
  * path (the sf0.01 recursive-CTE oracle covers engine parity). */
class WordpieceSpec extends SparkSpec {
  import spark.implicits._

  private def stats(s: String): (Long, Long, Long) = {
    val r = WordpieceStats.build(org.apache.spark.unsafe.types.UTF8String
      .fromString(s))
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("greedy longest match takes the longest piece at each position") {
    // "the" = one 3-char piece; "theory" = the|or|y (3 pieces: greedy
    // takes "the" over "th"/"t", then "or", then the 1-char fallback)
    assert(stats("the") == (1L, 1L, 0L))
    assert(stats("theory") == (1L, 3L, 0L))
    assert(stats("the theory") == (2L, 4L, 0L))
  }

  test("characters outside the vocabulary emit UNK and advance one") {
    // letters and digits always match (1-char fallbacks); punctuation
    // and non-ASCII are UNK
    assert(stats("?!") == (1L, 0L, 2L))
    assert(stats("a?b") == (1L, 2L, 1L))
    assert(stats("σσ") == (1L, 0L, 2L))
  }

  test("empty and all-space strings count zero words") {
    assert(stats("") == (0L, 0L, 0L))
    assert(stats("   ") == (0L, 0L, 0L))
  }

  test("vocabulary pieces cover every ASCII letter and digit") {
    assert((('a' to 'z') ++ ('0' to '9'))
      .forall(c => WordpieceStats.Vocab.contains(c.toString)))
  }

  test("column API matches build() through the codegen path") {
    val df = Seq((1L, "the theory"), (2L, "ingot 42!"))
      .toDF("id", "text")
      .select(col("id"), WordpieceStats(col("text")).as("wp"))
      .select(col("id"), col("wp.n_words"), col("wp.n_tokens"),
        col("wp.n_unk"))
      .orderBy("id").collect()
    assert((df(0).getLong(1), df(0).getLong(2), df(0).getLong(3)) ==
      (2L, 4L, 0L))
    // "ingot" = ing|ou?… greedy: "ing"(3) then "ot" is not a piece →
    // "o"(1), "t"(1) → 3 pieces; "42" = 4|2 → 2; "!" → UNK
    assert((df(1).getLong(1), df(1).getLong(2), df(1).getLong(3)) ==
      (2L, 5L, 1L))
  }
}
