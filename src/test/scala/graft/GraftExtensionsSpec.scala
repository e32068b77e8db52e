package graft

import org.apache.spark.sql.functions._

/** The SQL surface of the native expressions: after registration the
  * engine's operators are callable from spark.sql(...). */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("registered SQL functions evaluate like the Column API") {
    GraftExtensions.register(spark)
    Seq(("a b c d", Array(1.0f, 2.0f), Array(2.0f, 4.0f)))
      .toDF("text", "v1", "v2").createOrReplaceTempView("ext_in")
    val row = spark.sql(
      """SELECT cosine_similarity(v1, v2) AS cos,
        |       simhash32(split(text, ' ')) AS sh,
        |       shingles(split(text, ' '), 2) AS sg,
        |       minhash_signature(shingles(split(text, ' '), 2), 4) AS sig
        |FROM ext_in""".stripMargin).head()
    assert(math.abs(row.getAs[Double]("cos") - 1.0) < 1e-12)
    assert(row.getAs[scala.collection.Seq[String]]("sg").toList == List("a b", "b c", "c d"))
    assert(row.getAs[scala.collection.Seq[Long]]("sig").length == 4)
    // parity with the Column API on the same input
    val viaColumn = Seq("a b c d").toDF("text")
      .select(graft.functions.GraftFunctions.simhash32(col("text")).as("sh"))
      .as[Long].head()
    assert(row.getAs[Long]("sh") == viaColumn)
  }

  test("session built with spark.sql.extensions picks up the functions") {
    // newSession shares the extension-less state; instead verify the
    // extensions class is constructible and injectable as configured
    val ext = new GraftExtensions
    val holder = new org.apache.spark.sql.SparkSessionExtensions
    ext(holder) // must not throw — config path: spark.sql.extensions=graft.GraftExtensions
    assert(GraftExtensions.entries.map(_._1.funcName).toSet ==
      Set("cosine_similarity", "minhash_signature", "simhash32", "shingles",
        "rolling_hash", "text_counts", "token_set_fingerprint",
        "nfc_normalize", "lang_id", "media_dims", "clf_stats",
        "bigram_entropy_stats", "shingle_hashes", "token_hash_buckets",
        "wordpiece_stats", "bpe_merge", "dhash_bands",
        "media_energy_stats"))
  }

  test("round-13 registrations evaluate from SQL") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT lang_id('the cat and the hat is here') AS lid,
        |       wordpiece_stats('the theory').n_tokens AS wp,
        |       bpe_merge(array('a', 'a', 'a'), 'a', 'a') AS bm,
        |       clf_stats('the cat').n_toks AS ct,
        |       token_hash_buckets('a b', 0, 256) AS thb""".stripMargin)
      .head()
    assert(row.getAs[String]("lid") == "en")
    assert(row.getAs[Long]("wp") == 4L)
    assert(row.getAs[scala.collection.Seq[String]]("bm").toList ==
      List("aa", "a"))
    assert(row.getAs[Long]("ct") == 2L)
    assert(row.getAs[scala.collection.Seq[Long]]("thb").length == 2)
  }
}
