package graft.tools

import graft.core.Tables
import graft.operators._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off plan auditor: prints formatted physical plans for the headline
  * operators so shuffle/broadcast/codegen shape can be reviewed.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"

    println("==== KNN cosine ====")
    Knn.search(Tables.ordersCorpus(spark, dir), Tables.queryBatch(spark, 4),
      SearchParams(limit = 10, outputFields = Nil)).explain("formatted")

    println("==== column-pruned scan: q1_agg ====")
    graft.SparkEntry.queries("q1_agg")(spark, dir).explain("formatted")

    println("==== join_agg (broadcasts) ====")
    graft.SparkEntry.queries("q_join_agg")(spark, dir).explain("formatted")

    println("==== bm25 topk ====")
    graft.SparkEntry.queries("q_bm25_topk")(spark, dir).explain("formatted")
    spark.stop()
  }
}
