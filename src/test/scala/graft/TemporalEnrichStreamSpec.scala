package graft

import graft.streaming.TemporalEnrichStream._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Event-time streaming temporal join: facts buffer until the watermark
  * seals their event time, then enrich against the dim version history —
  * including versions that arrived AFTER the fact (out-of-order), the case
  * the buffering exists for.
  */
class TemporalEnrichStreamSpec extends SparkSpec {
  import spark.implicits._

  test("facts emit once sealed, matched to the version in force at their event time") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TEvent]
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")
    val out = enrich(mem.toDS().withWatermark("ts", "10 minutes"))
    val q = out.writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    def rows = spark.table("enriched").as[Enriched].collect().toSeq
    try {
      // v1 in force from :00; fact f1 at :10
      mem.addData(dims(1L, ts(0), "v1"), facts(1L, ts(10), 1.0))
      q.processAllAvailable()
      assert(rows.isEmpty) // watermark (:00) hasn't sealed :10 yet

      // OUT-OF-ORDER dim at :35 and fact f2 at :40 — wm is :00, both in time.
      // The advancing watermark (:30) seals f1 within this drain.
      mem.addData(dims(1L, ts(35), "v3"), facts(1L, ts(40), 2.0))
      q.processAllAvailable()
      assert(rows.map(e => (e.key, e.ts, e.dimTs, e.payload)) ==
        Seq((1L, ts(10).getTime, ts(0).getTime, "v1")))

      // wm :70 seals f2 (:40): must match the LATE-ARRIVED v3@:35, not v1
      mem.addData(facts(2L, ts(80), 9.0))
      q.processAllAvailable()
      assert(rows.exists(e =>
        e.key == 1L && e.ts == ts(40).getTime && e.payload == "v3"))

      // wm :90 seals key 2's fact @:80 — no dim for key 2 → -1 sentinel
      mem.addData(facts(3L, ts(100), 0.0))
      q.processAllAvailable()
      assert(rows.exists(e => e.key == 2L && e.ts == ts(80).getTime &&
        e.dimTs == -1L && e.payload == ""))
      // exactly-once: f1 and f2 appeared a single time each
      assert(rows.count(_.key == 1L) == 2)
    } finally q.stop()
  }

  test("restart from checkpoint: state (versions + pending) survives") {
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")
    val dir  = java.nio.file.Files.createTempDirectory("graft_enrich_ckpt").toString
    val ckpt = s"$dir/ckpt"
    val out  = s"$dir/out"
    // the memory sink cannot recover from a checkpoint — use foreachBatch
    // into parquet, the production sink shape
    def start(m: MemoryStream[TEvent]) =
      enrich(m.toDS().withWatermark("ts", "10 minutes"))
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Enriched], _: Long) =>
          batch.write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ckpt).outputMode("append").start()

    val mem = MemoryStream[TEvent]
    val q1 = start(mem)
    try {
      // version + a fact that stays PENDING across the restart
      mem.addData(dims(1L, ts(0), "v1"), facts(1L, ts(30), 1.0))
      q1.processAllAvailable()
    } finally q1.stop()

    // new source, same checkpoint: recovery must rebuild per-key state
    val mem2 = MemoryStream[TEvent]
    mem2.addData(facts(2L, ts(60), 0.0)) // advances wm → seals the pending fact
    val q2 = start(mem2)
    try {
      q2.processAllAvailable()
      mem2.addData(facts(3L, ts(90), 0.0))
      q2.processAllAvailable()
      val rows = spark.read.parquet(out).as[Enriched].collect().toSeq
      assert(rows.exists(e => e.key == 1L && e.ts == ts(30).getTime &&
        e.payload == "v1"), s"pending fact lost across restart: $rows")
    } finally q2.stop()
  }

  test("an old version survives pruning as the latest-before-watermark carry") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TEvent]
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")
    val out = enrich(mem.toDS().withWatermark("ts", "10 minutes"))
    val q = out.writeStream.format("memory").queryName("enriched2")
      .outputMode("append").start()
    try {
      // one version at :00, then hours of silence before a fact at :200
      mem.addData(dims(1L, ts(0), "v1"))
      q.processAllAvailable()
      mem.addData(facts(2L, ts(150), 0.0)) // advance wm far past :00
      q.processAllAvailable()
      mem.addData(facts(1L, ts(200), 5.0))
      q.processAllAvailable()
      mem.addData(facts(3L, ts(300), 0.0)) // seal :200
      q.processAllAvailable()
      val got = spark.table("enriched2").as[Enriched].collect()
        .filter(_.key == 1L).toSeq
      assert(got.map(e => (e.ts, e.dimTs, e.payload, e.value)) ==
        Seq((ts(200).getTime, ts(0).getTime, "v1", 5.0)))
    } finally q.stop()
  }
}
