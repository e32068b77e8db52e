package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** File-source/sink round trips beyond parquet (SURVEY.md §2.4 "only
  * Kafka topics in the reference") and the multi-source union. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(suffix: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$suffix").toString

  test("bucketed materialization: row parity, write-once memo, catalog-backed") {
    val df = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0))
      .toDF("k", "tag", "v")
    val out = Bucketing.bucketed(df, "bkt_spec", "t1", "k", 2, Seq("k", "v"))
    assert(out.as[(Long, Double)].collect().toSet ==
      Set((1L, 10.0), (2L, 20.0), (3L, 30.0)))
    // second call with the same (name, fingerprint) reuses the catalog
    // table — even from a DIFFERENT (here: empty) input frame, proving
    // the write really happened once
    val again = Bucketing.bucketed(df.limit(0), "bkt_spec", "t1", "k", 2,
      Seq("k", "v"))
    assert(again.count() == 3)
    // a new fingerprint (dataset rewritten) is a fresh table, and the
    // superseded fingerprint's catalog entry + files are dropped
    val fresh = Bucketing.bucketed(df.limit(1), "bkt_spec", "t2", "k", 2,
      Seq("k", "v"))
    assert(fresh.count() == 1)
    assert(!spark.catalog.tableExists("bkt_spec_t1"),
      "superseded fingerprint must be dropped")
  }

  test("bucketed materialization: per-name locks let distinct names run concurrently") {
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val df = Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
    val pool = Executors.newFixedThreadPool(4)
    val ready = new CountDownLatch(4)
    val results = (0 until 4).map { i =>
      pool.submit(new java.util.concurrent.Callable[Long] {
        override def call(): Long = {
          ready.countDown(); ready.await(30, TimeUnit.SECONDS)
          // two logical names, two racers each: same-name pairs must
          // write once; distinct names must not serialize behind one
          // global lock (they used to)
          Bucketing.bucketed(df, s"bkt_conc_${i % 2}", "f1", "k", 2,
            Seq("k", "v")).count()
        }
      })
    }
    assert(results.map(_.get(120, TimeUnit.SECONDS)).forall(_ == 2L))
    pool.shutdown()
    assert(spark.catalog.tableExists("bkt_conc_0_f1"))
    assert(spark.catalog.tableExists("bkt_conc_1_f1"))
  }

  test("dirFingerprint: full-depth walk sees nested and same-count changes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fp")
    val sub = java.nio.file.Files.createDirectories(dir.resolve("a/b/c"))
    val f = sub.resolve("data.bin")
    java.nio.file.Files.write(f, Array[Byte](1, 2, 3))
    val fp1 = Bucketing.dirFingerprint(dir.toString)
    // same file COUNT, same mtime resolution trap: change only the SIZE
    // of a file three levels deep
    java.nio.file.Files.write(f, Array[Byte](1, 2, 3, 4))
    val fp2 = Bucketing.dirFingerprint(dir.toString)
    assert(fp1 != fp2, "size change at depth 3 must perturb the fingerprint")
    assert(Bucketing.dirFingerprint(dir.toString) == fp2, "stable when unchanged")
  }

  test("csv round trip with header + schema") {
    val dir = tmp("csv")
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "s", "x")
    df.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(df.schema).csv(dir)
    assert(back.as[(Long, String, Double)].collect().toSet ==
      Set((1L, "a", 1.5), (2L, "b", 2.5)))
  }

  test("json lines round trip preserves nested structs") {
    val dir = tmp("json")
    val df = Seq((1L, ("x", 10)), (2L, ("y", 20))).toDF("id", "nested")
    df.write.mode("overwrite").json(dir)
    val back = spark.read.schema(df.schema).json(dir)
    assert(back.select("id", "nested._2").as[(Long, Int)].collect().toSet ==
      Set((1L, 10), (2L, 20)))
  }

  test("FileSources.jsonl quarantines malformed lines instead of failing the read") {
    import org.apache.spark.sql.types._
    val dir = tmp("jsonl_dl")
    val f = java.nio.file.Paths.get(dir, "part0.jsonl")
    java.nio.file.Files.write(f,
      ("""{"doc_id": 1, "text": "good line"}""" + "\n" +
       """{"doc_id": 2 "text": "missing comma"}""" + "\n" +
       """{"doc_id": 3, "text": "another good"}""" + "\n").getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val raw = FileSources.jsonl(spark, dir, schema)
    val (goodDf, deadDf, release) = FileSources.partitionValid(raw)
    try {
      val good = goodDf.as[(Long, String)].collect().toSet
      val dead = deadDf.as[String].collect()
      assert(good == Set((1L, "good line"), (3L, "another good")))
      assert(dead.length == 1 && dead.head.contains("missing comma"),
        s"malformed line must land in the dead-letter column: ${dead.toSeq}")
    } finally release()
  }

  test("FileSources csv round trip with explicit schema") {
    import org.apache.spark.sql.types._
    val dir = tmp("csv_fs")
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "s", "x")
    FileSources.writeCsv(df, dir)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("s", StringType), StructField("x", DoubleType)))
    val back = FileSources.wellFormed(FileSources.csv(spark, dir, schema))
    assert(back.as[(Long, String, Double)].collect().toSet ==
      Set((1L, "a", 1.5), (2L, "b", 2.5)))
  }

  test("FileSources.jsonlStream ingests dropped files via the streaming file source") {
    import org.apache.spark.sql.types._
    val dir = tmp("jsonl_stream")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "drop1.jsonl"),
      ("""{"doc_id": 1, "text": "first"}""" + "\n" +
       """{"doc_id": 2, "text": "second"}""" + "\n").getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "drop2.jsonl"),
      ("""{"doc_id": 3, "text": "third"}""" + "\n").getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = FileSources.wellFormed(FileSources.jsonlStream(spark, dir, schema))
    val q = stream.writeStream.format("memory").queryName("jsonl_in")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(q.awaitTermination(60000), "file-stream ingest did not finish")
    val out = spark.table("jsonl_in").as[(Long, String)].collect().toSet
    assert(out == Set((1L, "first"), (2L, "second"), (3L, "third")))
  }

  test("FileSources orc round trip with explicit schema and pushdown") {
    val dir = tmp("orc")
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5)).toDF("id", "s", "x")
    FileSources.writeOrc(df, dir)
    val back = FileSources.orc(spark, dir, df.schema)
    assert(back.as[(Long, String, Double)].collect().toSet ==
      Set((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5)))
    // projection + predicate reach the ORC scan like parquet
    val p = back.filter(col("id") > 1).select("id", "x")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,1)]"),
      s"ORC filter not pushed:\n$p")
  }

  test("FileSources xml round trip with rowTag + quarantined malformed record") {
    val dir = tmp("xml")
    val df = Seq((1L, "alpha"), (2L, "beta")).toDF("id", "s")
    FileSources.writeXml(df, dir, rowTag = "doc")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.StringType)))
    val back = FileSources.xml(spark, dir, rowTag = "doc", schema)
    assert(FileSources.wellFormed(back).as[(Long, String)].collect().toSet ==
      Set((1L, "alpha"), (2L, "beta")))
    // a record whose field can't coerce to the schema is quarantined,
    // not fatal — same dead-letter contract as jsonl
    val badDir = tmp("xml_bad")
    java.nio.file.Files.write(java.nio.file.Paths.get(badDir, "part-0.xml"),
      """<rows><doc><id>7</id><s>ok</s></doc><doc><id>NOT_A_NUMBER</id><s>bad</s></doc></rows>"""
        .getBytes("UTF-8"))
    val mixed = FileSources.xml(spark, badDir, rowTag = "doc", schema)
    // corrupt-column-only scans over raw files are disallowed
    // (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — partitionValid's
    // parse-once-then-fan-out is the supported shape, same as jsonl
    val (good, bad, release) = FileSources.partitionValid(mixed)
    try {
      assert(good.as[(Long, String)].collect().toSet == Set((7L, "ok")))
      assert(bad.count() == 1)
    } finally release()
  }

  test("unionAll merges heterogeneous-order sources by name") {
    val a = Seq((1, "x")).toDF("n", "s")
    val b = Seq(("y", 2)).toDF("s", "n") // reversed column order
    val u = Tables.unionAll(Seq(a, b))
    assert(u.as[(Int, String)].collect().toSet == Set((1, "x"), (2, "y")))
  }

  test("metric seam guard drops NaN/±Inf doubles, keeps NULL (r16)") {
    val dir = tmp("guard")
    Seq(
      (1L, 1L, 1L, 1, 5.0, 10.0, 0.1, 0.0, "A", "O", java.sql.Timestamp.valueOf("1995-01-01 00:00:00")),
      (2L, 2L, 1L, 1, Double.NaN, 10.0, 0.1, 0.0, "A", "O", java.sql.Timestamp.valueOf("1995-01-02 00:00:00")),
      (3L, 3L, 1L, 1, 5.0, Double.PositiveInfinity, 0.1, 0.0, "A", "O", java.sql.Timestamp.valueOf("1995-01-03 00:00:00")),
      (4L, 4L, 1L, 1, 5.0, 10.0, Double.NegativeInfinity, 0.0, "A", "O", java.sql.Timestamp.valueOf("1995-01-04 00:00:00")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      // NULL quantity row appended via union (the tuple encoder can't
      // carry a null Double) — the guard must KEEP it
      .unionByName(spark.sql(
        "SELECT 5L AS l_orderkey, 5L AS l_partkey, 1L AS l_suppkey, " +
          "1 AS l_linenumber, CAST(NULL AS DOUBLE) AS l_quantity, " +
          "10.0D AS l_extendedprice, 0.1D AS l_discount, 0.0D AS l_tax, " +
          "'A' AS l_returnflag, 'O' AS l_linestatus, " +
          "TIMESTAMP '1995-01-05 00:00:00' AS l_shipdate"))
      .write.parquet(s"$dir/lineitem.parquet")
    val kept = Tables.lineitem(spark, dir)
      .select("l_orderkey").as[Long].collect().toSet
    assert(kept == Set(1L, 5L), s"guard kept $kept")
  }

  test("partitioned parquet write prunes partitions on read") {
    val dir = tmp("part")
    Sinks.writePartitioned(
      Seq((1, "a", 10), (2, "b", 20), (3, "a", 30)).toDF("id", "part", "v"),
      dir, partitionCols = Seq("part"))
    val pruned = spark.read.parquet(dir).filter(col("part") === "a")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() == 2)
    assert(plan.contains("PartitionFilters: [isnotnull(part"), s"no partition pruning:\n$plan")
  }
}
