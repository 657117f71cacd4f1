package graft

import graft.functions.KmvSketch
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The KMV distinct sketch under Structured Streaming: a watermarked
  * event-time window aggregation carrying the custom
  * TypedImperativeAggregate — per-window distinct-user estimates with
  * bounded state, the streaming face of q_kmv_vocab.
  */
class StreamingKmvSpec extends SparkSpec {
  import spark.implicits._

  test("windowed streaming distinct-count sketch (update mode, exact below k)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    val agg = mem.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "30 minutes"))
      .agg(KmvSketch.kmvArray(
        (col("user_id") * 2654435761L) % 4294967296L, 32).as("sk"))
      .select(col("window"), size(col("sk")).as("n"),
        KmvSketch.estimate(col("sk"), 32).as("est"))
    val q = agg.writeStream.format("memory").queryName("kmv_win")
      .outputMode("update").start()
    try {
      // window :00-:30 sees users {1,2,3} (2 repeated); wm stays at :10
      mem.addData((ts(1), 1L), (ts(5), 2L), (ts(9), 2L), (ts(20), 3L))
      q.processAllAvailable()
      mem.addData((ts(25), 3L), (ts(26), 4L)) // still in-window: update to 4
      q.processAllAvailable()
      mem.addData((ts(40), 7L)) // :30-:60 window opens
      q.processAllAvailable()
      val rows = spark.table("kmv_win").collect()
        .map(r => (r.getStruct(0).getTimestamp(0).toString.take(16),
          r.getInt(1), r.getDouble(2)))
        .groupBy(_._1).map { case (w, rs) => w -> rs.map(x => (x._2, x._3)).max }
      assert(rows("2024-01-01 00:00") == (4, 4.0)) // {1,2,3,4} exact below k
      assert(rows("2024-01-01 00:30") == (1, 1.0)) // {7}
    } finally q.stop()
  }

  test("windowed streaming Misra-Gries candidates (update mode)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    val agg = mem.toDF().toDF("ts", "term")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "30 minutes"))
      .agg(graft.functions.HeavyHitters.mgTerms(col("term"), 4).as("cand"))
      .select(col("window"), col("cand"))
    val q = agg.writeStream.format("memory").queryName("mg_win")
      .outputMode("update").start()
    try {
      // "hot" dominates window :00 among 6 distinct terms with k=4
      mem.addData((Seq.fill(10)((ts(5), "hot")) ++
        (1 to 5).map(i => (ts(6), s"cold$i"))): _*)
      q.processAllAvailable()
      val cand = spark.table("mg_win").collect()
        .map(r => r.getSeq[String](1)).last
      assert(cand.contains("hot"), s"dominant term lost: $cand")
      assert(cand.size <= 4)
    } finally q.stop()
  }
}
