package graft

import graft.core.Tables
import graft.functions.{Vec, VecDot, VecNorm2}
import graft.plans.GraftExtensions
import org.apache.spark.sql.functions._

class ExtensionsSpec extends SparkSpec {

  test("RewriteVectorHofs replaces HOF dot/norm with codegen kernels, bitwise-identically") {
    GraftExtensions.install(spark)
    val corpus = Tables.ordersCorpus(spark, Sf).limit(50)
      .select(col("doc_id"), col("dv"))
    val q = Tables.queryBatch(spark, 1)

    val df = corpus.crossJoin(broadcast(q))
      .select(col("doc_id"),
        Vec.dot(col("qv"), col("dv")).as("d"),
        Vec.norm2(col("dv")).as("n"))

    val optimized = df.queryExecution.optimizedPlan
    val exprs = optimized.expressions.flatMap(_.collect {
      case e: VecDot => e
      case e: VecNorm2 => e
    })
    assert(exprs.exists(_.isInstanceOf[VecDot]), "dot HOF not rewritten")
    assert(exprs.exists(_.isInstanceOf[VecNorm2]), "norm2 HOF not rewritten")

    // bitwise equality with the interpreted HOF evaluation
    val fast = df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    spark.experimental.extraOptimizations = Nil // uninstall
    val slow = df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(fast == slow)
  }

  test("vector kernels are SQL functions after install (vec_dot/vec_norm2/vec_cosine)") {
    GraftExtensions.install(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
        "vec_norm2(array(3.0d, 4.0d)) AS n, " +
        "vec_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c").head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 25.0)
    assert(r.getDouble(2) == 1.0)
    spark.experimental.extraOptimizations = Nil
  }
}
