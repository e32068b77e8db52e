package graft.sources

import org.apache.spark.sql.DataFrame

/** Write-side conventions for lake-scale tables — the sink counterparts
  * of the co-location and pruning properties PlanSpec asserts on the read
  * side. The reference's only sink is a Kafka topic (reference:
  * src/kafka_streams_clojure/api.clj:163-164); batch table layout is part
  * of the engine's superset.
  */
object Sinks {

  /** Bucket-and-sort a table on its join key at WRITE time: two tables
    * bucketed the same way equi-join with ZERO exchanges on either side
    * (the 100 TB fact-fact join answer — shuffle once at write, join
    * shuffle-free forever after). Bucketed output requires the table
    * catalog (`saveAsTable`), not a bare path: bucket metadata lives in
    * the catalog. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    nBuckets: Int, path: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
    // an explicit path makes the table EXTERNAL (data outside the
    // warehouse dir); bucket metadata still lives in the catalog
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Hive-style partitioned parquet with bounded file sizes:
    * `partitionBy` gives reads partition pruning on the filter columns;
    * `maxRecordsPerFile` stops one writer task from emitting a
    * multi-gigabyte file (the small-files/giant-files balance every lake
    * job has to strike). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       maxRecordsPerFile: Long = 5000000L): Unit =
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
}
