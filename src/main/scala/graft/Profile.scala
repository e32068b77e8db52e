package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling main (not shipped surface): times sub-steps of the
  * slowest bench queries to localize overhead. Run:
  *   sbt "runMain graft.Profile"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // replicate Bench's sub-5M-row configuration
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    import org.apache.spark.sql.functions._
    import graft.llm.Similarity
    import graft.sources.Tables

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROFILE $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    // warmup identical to Bench
    spark.range(100000).selectExpr("id % 97 as k", "cast(id % 7 as double) as v")
      .groupBy("k").count().queryExecution.toRdd.count()

    val e = Tables.embeddings(spark, sfDir)
    time("embeddings count")(e.count())

    import spark.implicits._
    val coarse = time("coarse collect") {
      e.filter(col("vec_id") < 16).select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])].collect().sortBy(_._1).toSeq
    }
    val books = time("pqTrain m=2 k=4 iters=2") {
      Similarity.pqTrain(e, col("vec_id"), col("embedding"), m = 2, k = 4, iters = 2)
    }
    val qv = time("qv head") {
      e.filter(col("vec_id") === 0).select(col("embedding")).as[Seq[Float]].head()
    }
    time("pqIndex+ivfPqTopK action") {
      val idx = Similarity.pqIndex(e.filter(col("vec_id") =!= 0),
        col("vec_id"), col("embedding"), coarse, books)
      Similarity.ivfPqTopK(idx, coarse, books, qv, nProbes = 3, k = 10)
        .queryExecution.toRdd.count()
    }
    time("pqTrain AGAIN (2nd)") {
      Similarity.pqTrain(e, col("vec_id"), col("embedding"), m = 2, k = 4, iters = 2)
    }
    val cents = time("kmeans k=4 iters=2") {
      Similarity.kmeans(e, col("vec_id"), col("embedding"), 4, 2)
    }
    time("ivfAssignWith+topK action") {
      val assigned = Similarity.ivfAssignWith(e, col("vec_id"), col("embedding"), cents)
      Similarity.ivfTopK(assigned, queryId = 0L, k = 10)
        .queryExecution.toRdd.count()
    }
    // graph side — phase breakdown with a job/stage counter
    @volatile var jobs = 0; @volatile var stages = 0; @volatile var tasks = 0
    @volatile var verbose = false
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs += 1; stages += j.stageInfos.size
        tasks += j.stageInfos.map(_.numTasks).sum
        if (verbose) println(s"PROFILE   job ${j.jobId}: stages=${j.stageInfos.size} " +
          j.stageInfos.map(si => si.name.takeWhile(_ != '\n').take(60)).mkString(" | "))
      }
    })
    val eBuild = Tables.orders(spark, sfDir)
      .join(Tables.lineitem(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey").cast("long") * 2).as("src"),
        (col("l_suppkey").cast("long") * 2 + 1).as("dst"))
    time("pagerank edge-build alone (distinct+repartition)") {
      eBuild.distinct().repartition(col("src")).queryExecution.toRdd.count()
    }
    jobs = 0; stages = 0; tasks = 0
    val pr = time("pageRank 3 iters full") {
      graft.entry.GraphQueries.queries("q_pagerank")(spark, sfDir)
        .queryExecution.toRdd.count()
    }
    // the listener bus is async — give queued JobStart events time to
    // drain before reading the counters (dev tool; sleep is fine)
    Thread.sleep(1000)
    println(s"PROFILE pagerank jobs=$jobs stages=$stages tasks=$tasks")
    graft.llm.Dedup.releaseCaches()
    jobs = 0; stages = 0; tasks = 0; verbose = true
    time("pageRank AGAIN") {
      graft.entry.GraphQueries.queries("q_pagerank")(spark, sfDir)
        .queryExecution.toRdd.count()
    }
    Thread.sleep(1000)
    verbose = false
    println(s"PROFILE pagerank2 jobs=$jobs stages=$stages tasks=$tasks")
    graft.llm.Dedup.releaseCaches()
    locally {
      val plan = graft.entry.GraphQueries.queries("q_pagerank")(spark, sfDir)
        .queryExecution.executedPlan.toString
      println("PROFILE-PLAN-BEGIN")
      println(plan.split("\n").map(l => "PLAN " + l).mkString("\n"))
      println("PROFILE-PLAN-END")
    }
    graft.llm.Dedup.releaseCaches()
    time("neardup_components full") {
      SparkEntry.queries("q_neardup_components")(spark, sfDir)
        .queryExecution.toRdd.count()
    }
    graft.llm.Dedup.releaseCaches()
    time("component_rep full") {
      SparkEntry.queries("q_component_rep")(spark, sfDir)
        .queryExecution.toRdd.count()
    }
    graft.llm.Dedup.releaseCaches()
    time("tfidf full") {
      SparkEntry.queries("q_tfidf")(spark, sfDir).queryExecution.toRdd.count()
    }
    graft.llm.Dedup.releaseCaches()
    time("grouped_agg full") {
      SparkEntry.queries("q_grouped_agg")(spark, sfDir).queryExecution.toRdd.count()
    }
    time("union full") {
      SparkEntry.queries("q_union")(spark, sfDir).queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
