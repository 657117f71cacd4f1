package graft

import graft.functions.KmvSketch
import org.apache.spark.sql.functions._

/** KMV distinct sketch: exactness below k, estimator accuracy, order- and
  * partitioning-invariance (the merge path), and the map-side-combinable
  * aggregation plan.
  */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  /** Knuth-hash a long id into the [0, 2^32) domain the estimator assumes. */
  private def h(c: org.apache.spark.sql.Column) =
    (c * 2654435761L) % 4294967296L

  test("below k the sketch is the exact distinct set") {
    val df = Seq(1L, 2L, 3L, 2L, 1L, 4L).toDF("v")
      .agg(KmvSketch.kmvArray(h($"v"), k = 16).as("sk"))
      .select(size($"sk"), KmvSketch.estimate($"sk", 16))
    val row = df.collect().head
    assert(row.getInt(0) == 4 && row.getDouble(1) == 4.0)
  }

  test("estimator lands within 20% of truth at k=256 over 20k distincts") {
    val n = 20000
    val est = spark.range(n).toDF("v")
      .agg(KmvSketch.kmvArray(h($"v"), k = 256).as("sk"))
      .select(KmvSketch.estimate($"sk", 256)).as[Double].collect().head
    assert(math.abs(est - n) / n < 0.2, s"estimate $est for true $n")
  }

  test("sketch is invariant to partitioning and row order (merge path)") {
    val base = spark.range(5000).toDF("v")
      .withColumn("g", $"v" % 3)
    def sketch(parts: Int) = base.repartition(parts, $"v")
      .groupBy("g").agg(KmvSketch.kmvArray(h($"v"), 64).as("sk"))
      .select($"g", $"sk").as[(Long, Seq[Long])].collect().sortBy(_._1).toSeq
    assert(sketch(1) == sketch(13))
    assert(sketch(13) == sketch(31))
  }

  test("nulls are ignored, not hashed") {
    val df = Seq(Some(1L), None, Some(2L), None).toDF("v")
      .agg(KmvSketch.kmvArray(h($"v"), 8).as("sk"))
      .select(size($"sk")).as[Int].collect().head
    assert(df == 2)
  }

  test("plan: ObjectHashAggregate with a partial kmv pass before the exchange") {
    val p = spark.range(100).toDF("v").withColumn("g", $"v" % 2)
      .groupBy("g").agg(KmvSketch.kmvArray(h($"v"), 8).as("sk"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("ObjectHashAggregate"), s"expected object hash agg:\n$p")
    assert(p.contains("partial_kmv_sketch"), s"map-side partial missing:\n$p")
  }
}
