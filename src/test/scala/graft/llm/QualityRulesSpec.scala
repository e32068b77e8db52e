package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed pins for the Gopher repetition rule pack. */
class QualityRulesSpec extends SparkSpec {
  import spark.implicits._

  private def rules(text: String): Map[String, Double] = {
    val r = TextAnalysis.qualityRules(
      Seq((1L, text)).toDF("doc_id", "text"), col("doc_id"), col("text"))
      .collect()(0)
    r.schema.fieldNames.zipWithIndex.drop(1)
      .map { case (f, i) => f -> r.getDouble(i) }.toMap
  }

  test("duplicate line and char fractions count repeat occurrences only") {
    // 4 lines: "a b" ×2 (len 3), "c" ×1, "dd" ×1 → dup lines 1/4;
    // removable chars 3 of 13 total (text len incl newlines)
    val t = "a b\nc\na b\ndd"
    val m = rules(t)
    assert(m("dup_line_frac") === 0.25)
    assert(m("dup_line_char_frac") === 3.0 / t.length)
    // no paragraph splits → 1 para, no dups
    assert(m("dup_para_frac") === 0.0)
  }

  test("duplicate paragraphs: 'para one' ×3 of 4 → frac 0.5") {
    val t = "para one\n\npara two\n\npara one\n\npara one"
    val m = rules(t)
    assert(m("dup_para_frac") === 0.5)
    // two removable "para one" (8 chars each) over 38 chars
    assert(m("dup_para_char_frac") === 16.0 / t.length)
    // line split sees single \n inside \n\n: lines are
    // "para one","","para two","","para one","","para one" → 7 lines,
    // dups: para one ×2 extra + "" ×2 extra = 4/7
    assert(m("dup_line_frac") === 4.0 / 7.0)
  }

  test("top n-gram char fraction: count × gram length over doc chars") {
    // tokens: x y x y x y z (13 chars); 2-grams: "x y"×3, "y x"×2, "y z"
    // top2 = 3*3=9/13; 3-grams: "x y x"×2, "y x y"×2, "x y z" → tie on
    // count, equal len 5 → 2*5=10/13; 4-grams: "x y x y"×2 → 14/13 (the
    // raw coverage is uncapped by design)
    val t = "x y x y x y z"
    val m = rules(t)
    assert(m("top2_char_frac") === 9.0 / 13.0)
    assert(m("top3_char_frac") === 10.0 / 13.0)
    assert(m("top4_char_frac") === 14.0 / 13.0)
  }

  test("empty and gram-free docs emit zeros, not nulls or errors") {
    val m0 = rules("")
    assert(m0.values.forall(_ === 0.0))
    val m1 = rules("single") // one token: no 2-grams
    assert(m1("top2_char_frac") === 0.0)
    assert(m1("dup_line_frac") === 0.0)
  }

  test("c4Clean: line rules (terminal punct after rtrim, >=3 words, javascript) and page gates") {
    val docs = Seq(
      // survivor: 5 sentence marks exactly; one line saved by rtrim,
      // one dropped per rule
      (1L, "Good sentence one. Good sentence two! Three here? Four now. \n" +
        "no punct line\nTwo words.\nRuns on JAVASCRIPT everywhere.\n" +
        "Fifth good sentence. "),
      (2L, "Only four sentences. Right here! Three now? And four."), // < 5 → gate
      (3L, "Fine sentence one. But lorem IPSUM appears. More words here. " +
        "Another one follows. Fifth sentence closes."),            // lorem ipsum
      (4L, ""))                                                    // empty
      .toDF("doc_id", "text")
    val out = TextAnalysis.c4Clean(docs, col("doc_id"), col("text"))
      .orderBy("doc_id")
      .as[(Long, String, Long, Long, Long, Boolean)].collect()
    val d1 = out(0)
    assert(d1._6, "doc 1 must survive at the 5-sentence boundary")
    assert(d1._3 == 2L && d1._4 == 5L, s"kept/total lines: $d1")
    assert(d1._5 == 5L, s"sentence marks: $d1")
    assert(d1._2 == "Good sentence one. Good sentence two! Three here? Four now. \n" +
      "Fifth good sentence. ", "kept lines keep their ORIGINAL text (rtrim is only a test)")
    assert(!out(1)._6 && out(1)._5 == 4L, "four sentences fails the page gate")
    assert(!out(2)._6, "lorem ipsum page gate (case-folded)")
    assert(!out(3)._6 && out(3)._2 == "" && out(3)._3 == 0L,
      "empty doc: empty clean text, not null")
  }
}
