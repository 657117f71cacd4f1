package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import graft.core.Tables

/** Pins `Tables.tsMicros`: whatever physical representation the testdata
  * generator picks for `events.ts` (int64 nanos under nanosAsLong,
  * Timestamp, or TimestampNTZ — it has shipped all three across rounds),
  * the ts-consuming queries must see identical epoch-microsecond longs.
  */
class TsMicrosSpec extends SparkSpec {

  private val usValues = Seq(0L, 1_700_000_000_123_456L, 999L)

  test("LongType nanos column divides to microseconds") {
    import spark.implicits._
    val df = usValues.map(_ * 1000).toDF("ts")
    assert(Tables.tsMicros(df).as[Long].collect().toSeq == usValues)
  }

  test("TimestampType column converts via unix_micros") {
    import spark.implicits._
    val df = usValues.toDF("us")
      .select(timestamp_micros(col("us")).as("ts"))
    assert(df.schema("ts").dataType == TimestampType)
    assert(Tables.tsMicros(df).select("ts").as[Long].collect().toSeq == usValues)
  }

  test("TimestampNTZType column is interpreted as UTC wall-clock") {
    import spark.implicits._
    val ntz = spark.createDataFrame(
      spark.sparkContext.parallelize(usValues.map { us =>
        Row(java.time.LocalDateTime.ofEpochSecond(
          us / 1_000_000, (us % 1_000_000).toInt * 1000,
          java.time.ZoneOffset.UTC))
      }),
      StructType(Seq(StructField("ts", TimestampNTZType))))
    assert(Tables.tsMicros(ntz).select("ts").as[Long].collect().toSeq == usValues)
  }

  test("the real events table normalizes and buckets") {
    val ev = Tables.tsMicros(Tables.load(spark, Sf, "events"))
    assert(ev.schema("ts").dataType == LongType)
    val n = ev.filter(col("ts") > 0).count()
    assert(n > 0)
  }

  test("unsupported representation is rejected loudly") {
    import spark.implicits._
    val df = Seq("oops").toDF("ts")
    assertThrows[IllegalArgumentException](Tables.tsMicros(df))
  }
}
