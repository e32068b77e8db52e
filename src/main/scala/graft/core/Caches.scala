package graft.core

import org.apache.spark.sql.DataFrame

/** Process-wide registry of persisted DataFrames that back lazily
  * returned results (dedup band tables, graph rank vectors). Spark has
  * no "unpersist when the consuming action finishes" hook, so producers
  * register handles here and the harness (Verify/Bench/JudgeProbe)
  * drains the queue after each query's action completes. Untracked,
  * these persists would pin executor storage for the session lifetime.
  *
  * SINGLE-CONSUMER contract: [[release]] drops the caches behind EVERY
  * frame registered since the last release — safe under the strictly
  * sequential build→action→release usage of the harness, NOT safe with
  * concurrent or lazily-held frames. A multi-tenant service would scope
  * handles per returned frame (a Closeable pair) instead.
  */
object Caches {
  private val handles = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` and register the handle for the next [[release]]. */
  def track(df: DataFrame): DataFrame = {
    val p = df.persist()
    handles.add(p)
    p
  }

  /** Unpersist every registered handle since the last release. */
  def release(): Unit = {
    var df = handles.poll()
    while (df != null) { df.unpersist(blocking = false); df = handles.poll() }
  }
}
