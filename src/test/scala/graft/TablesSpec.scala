package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Pins the encoding-agnostic contract of Tables.events: whether the
  * generator wrote `ts` as INT64 epoch-nanos or as TIMESTAMP micros, the
  * loaded frame exposes the same logical schema (`ts_nanos` BIGINT exact
  * nanos + `ts` session-TZ timestamp) with identical values. This is the
  * regression test for the round-7 testdata regeneration that silently
  * flipped the physical encoding and broke every events query: no unit
  * fixture exercised the real loader, so 183 tests stayed green while
  * q12/q13/q14/q20/q24/q25/q26 all failed at bench time.
  */
class TablesSpec extends SparkSuite {
  import spark.implicits._

  // Two epoch-nanos instants, micros-aligned (both encodings can carry
  // them exactly): 2024-01-01T00:00:00.000001Z and +1h.
  private val nanos = Seq(1704067200000001000L, 1704070800000002000L)

  private def writeDir(): String =
    Files.createTempDirectory("graft-events-enc").toString

  test("events loader normalizes INT64-nanos and TIMESTAMP-micros encodings identically") {
    // Limitation: Spark cannot WRITE parquet TIMESTAMP(NANOS), so this
    // fixture is a plain unannotated INT64 column — it exercises the
    // post-read LongType branch, not the nanosAsLong logical-type read
    // path the real generator produces (covered only at bench/verify
    // time against the driver's parquet).
    val longDir = writeDir()
    nanos.zipWithIndex
      .map { case (ns, i) => (i.toLong, ns, i.toLong, "click", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$longDir/events.parquet")

    val tsDir = writeDir()
    nanos.zipWithIndex
      .map { case (ns, i) => (i.toLong, ns, i.toLong, "click", 1.0, "{}") }
      .toDF("event_id", "ts_src", "user_id", "event_type", "value", "props")
      // integer `div`, not `/ 1000`: double division of ~1.7e18 is the
      // exact ULP-256ns hazard the loader's own comment warns about
      .withColumn("ts", expr("timestamp_micros(ts_src div 1000)").cast("timestamp_ntz"))
      .drop("ts_src")
      .write.mode("overwrite").parquet(s"$tsDir/events.parquet")

    val fromLong = Tables.events(spark, longDir)
    val fromTs   = Tables.events(spark, tsDir)

    for (df <- Seq(fromLong, fromTs)) {
      assert(df.schema("ts_nanos").dataType === LongType)
      assert(df.schema("ts").dataType === TimestampType)
    }

    val a = fromLong.select("event_id", "ts_nanos", "ts").orderBy("event_id").collect()
    val b = fromTs.select("event_id", "ts_nanos", "ts").orderBy("event_id").collect()
    assert(a.toSeq === b.toSeq)
    assert(a.map(_.getLong(1)).toSeq === nanos)
  }
}
