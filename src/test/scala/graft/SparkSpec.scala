package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.{BeforeAndAfterAll, BeforeAndAfterEach}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (one JVM-wide session, local[4],
  * tiny shuffle fan-out — these are semantics tests, not perf tests).
  * Every test drains the tracked-persist registry afterwards, so
  * library calls that persist (band tables, posting lists, pageRank
  * working sets) can't leak cached frames across tests or couple one
  * suite's storage to another's release call. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll with BeforeAndAfterEach {
  lazy val spark: SparkSession = SparkSpec.session
  override def afterAll(): Unit = {} // session shared across suites
  override def afterEach(): Unit = graft.core.Caches.release()
}

object SparkSpec {
  lazy val session: SparkSession = {
    java.util.Locale.setDefault(java.util.Locale.ROOT) // locale-free string ops (see Verify)
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
