package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table materialization — the storage-layout half of the
  * 100 TB join story. A fact⋈fact join normally shuffles BOTH sides on
  * the key every time it runs; writing each side ONCE as a hash-bucketed
  * datasource table (`bucketBy(n, key)`) bakes that partitioning into
  * the layout, and every subsequent join on the key reads the buckets
  * co-located: zero exchanges, forever. That trade — one write-time
  * shuffle amortized over every downstream join — is the standard lake
  * discipline for repeatedly-joined tables (dedup ledgers, doc↔metadata,
  * fact↔fact), and it composes with everything else here because the
  * result is an ordinary DataFrame.
  *
  * Parity notes: bucket PRUNING and join co-location require reading
  * through the session catalog (`spark.table`), not the path — the
  * bucket spec lives in catalog metadata. Tables are EXTERNAL, written
  * under java.io.tmpdir, one per (logical name, dataset fingerprint):
  * the fingerprint (file count + max mtime, the artifact-memo rule from
  * entry/LlmQueries) keys the CATALOG name, so a dataset regenerated
  * under a reused path gets a fresh table instead of stale buckets.
  * Bucket files are one-per-writer-task per bucket; the merge join
  * re-sorts within partitions (cheap, no exchange) when a bucket spans
  * files.
  */
object Bucketing {

  /** Materialize `df` (projected to `cols`) as a parquet table bucketed
    * and bucket-sorted by `key` into `nBuckets`, once per (name,
    * fingerprint) per session, and return the catalog-backed DataFrame.
    * Re-invocations (every query run after the first) skip straight to
    * the catalog read — the "write once, join shuffle-free after"
    * contract. */
  def bucketed(df: DataFrame, name: String, fingerprint: String,
               key: String, nBuckets: Int, cols: Seq[String]): DataFrame =
    synchronized {
      val spark = df.sparkSession
      val table = sanitize(s"${name}_$fingerprint")
      if (!spark.catalog.tableExists(table)) {
        val dir = new java.io.File(
          sys.props("java.io.tmpdir"), s"graft_bucketed/$table")
        Sinks.writeBucketed(df.select(cols.head, cols.tail: _*), table,
          Seq(key), nBuckets, Some(dir.getAbsolutePath))
      }
      spark.table(table)
    }

  /** Cheap dataset fingerprint for the catalog-name key: top-level files
    * plus one directory level, count:maxMtime (the LlmQueries artifact
    * staleness rule). */
  def dirFingerprint(d: String): String = {
    def ls(f: java.io.File): Array[java.io.File] =
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
    val top = ls(new java.io.File(d))
    val fs = top.filter(_.isFile) ++ top.filter(_.isDirectory).flatMap(ls)
    s"${fs.length}_${fs.foldLeft(0L)((m, f) => math.max(m, f.lastModified()))}"
  }

  private def sanitize(s: String): String =
    s.replaceAll("[^A-Za-z0-9_]", "_").toLowerCase(java.util.Locale.ROOT)
}
