package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.types.TimestampType

/** Schema contract for `Tables.events`: the driver has shipped `ts` as
  * parquet TIMESTAMP(NANOS), TIMESTAMP(MICROS, isAdjustedToUTC=false)
  * and TIMESTAMP(MICROS, UTC) across data generations. All three must
  * load as a native `TimestampType` with identical epoch micros —
  * round 9/10 regression class: unit tests built in-memory frames with
  * native TimestampType, so an NTZ parquet crash (`unix_micros` rejects
  * TIMESTAMP_NTZ) never showed in `sbt test` while q_resample crashed
  * on every driver dataset. These fixtures are real parquet files in
  * each physical flavor (src/test/resources/events_flavors/). */
class EventsSchemaSpec extends SparkSpec {

  private val expectedMicros =
    Seq(1700000000000000L, 1700003600000000L, 1700007200000000L)

  private def flavorDir(name: String): String =
    getClass.getResource(s"/events_flavors/$name").getPath

  // int64_micros: a bare INT64 ts with NO parquet logical annotation —
  // Tables.events must read the footer and NOT apply the ns→us
  // truncation (blindly dividing micros by 1000 would shift every
  // event by 1000x with no error)
  for (flavor <- Seq("nanos", "micros_ntz", "micros_utc", "int64_micros")) {
    test(s"events ts normalizes to TimestampType with exact micros [$flavor]") {
      val df = Tables.events(spark, flavorDir(flavor))
      assert(df.schema("ts").dataType == TimestampType,
        s"flavor $flavor must normalize to TimestampType, " +
          s"got ${df.schema("ts").dataType}")
      val micros = df
        .select(org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("ts")))
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(micros == expectedMicros,
        s"flavor $flavor epoch micros drifted: $micros")
    }
  }

  test("event-time ops run on every physical flavor (resample smoke)") {
    import org.apache.spark.sql.functions.col
    for (flavor <- Seq("nanos", "micros_ntz", "micros_utc", "int64_micros")) {
      val out = graft.agg.TimeSeries.resampleForwardFill(
        Tables.events(spark, flavorDir(flavor)),
        col("user_id"), col("ts"), col("value"), 3600000000L)
      assert(out.count() > 0, s"resample produced no rows on $flavor")
    }
  }
}
