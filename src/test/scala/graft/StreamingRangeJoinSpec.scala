package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream time-interval join — the streaming counterpart of
  * TemporalJoin.rangePairs, expressed with Spark's NATIVE stream-stream
  * join (equi key + event-time range condition + watermarks on both
  * sides, which is exactly the shape that lets Spark bound join state):
  * clicks attach to impressions of the same ad within [its, its + 5 min].
  */
class StreamingRangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("clicks join impressions within the event-time window, streaming") {
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    val impStream = MemoryStream[(Long, java.sql.Timestamp)]
    val clkStream = MemoryStream[(Long, java.sql.Timestamp)]
    val imp = impStream.toDF().toDF("ad", "its").withWatermark("its", "10 minutes")
    val clk = clkStream.toDF().toDF("cad", "cts").withWatermark("cts", "10 minutes")
    val joined = imp.join(clk,
      expr("ad = cad AND cts >= its AND cts <= its + interval 5 minutes"))
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      impStream.addData((1L, ts(0)), (2L, ts(0)), (1L, ts(20)))
      clkStream.addData(
        (1L, ts(3)),   // in-window for imp@:00
        (1L, ts(7)),   // past :00+5 — only a MISS (imp@:20 not in range either)
        (2L, ts(2)),   // in-window for ad 2
        (1L, ts(24)))  // in-window for imp@:20
      q.processAllAvailable()
      // advance both watermarks so all joins finalize
      impStream.addData((9L, ts(60))); clkStream.addData((9L, ts(60)))
      q.processAllAvailable()
      val got = spark.table("attrib")
        .select($"ad", $"its", $"cts").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString.take(16),
          r.getTimestamp(2).toString.take(16))).toSet
      assert(got.contains((1L, "2024-01-01 00:00", "2024-01-01 00:03")))
      assert(got.contains((2L, "2024-01-01 00:00", "2024-01-01 00:02")))
      assert(got.contains((1L, "2024-01-01 00:20", "2024-01-01 00:24")))
      assert(!got.exists(_._3 == "2024-01-01 00:07"), "out-of-window click joined")
      // the :60 watermark tick joins itself (0-gap is in-window) — ignore it
      assert(got.filterNot(_._1 == 9L).size == 3)
    } finally q.stop()
  }
}
