package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector scoring as Catalyst higher-order functions (codegen'd —
  * no UDFs). Metrics mirror the reference's Milvus search metrics
  * COSINE | L2 | IP (`/root/reference/app/models/search_request.py:188-205`).
  *
  * All three are written as a fold over `zip_with` products. When the inputs
  * are integer-valued doubles (see [[graft.core.Tables.synthVec]]) every
  * partial sum is an exact integer, so the final double is order-independent
  * and bitwise-reproducible in the DuckDB oracle.
  */
object Vec {

  /** Σ a_i·b_i */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Σ a_i² */
  def norm2(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x * x)

  /** cosine(a,b) = dot / (sqrt(|a|²) * sqrt(|b|²)) — written with exactly this
    * association so the oracle SQL produces the same bits.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Euclidean distance sqrt(Σ (a_i-b_i)²). */
  def l2(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x))

  /** Inner-product metric (higher = closer). */
  def ip(a: Column, b: Column): Column = dot(a, b)

  /** Score column for a metric name; `higherIsBetter(metric)` gives sort
    * direction (L2 is a distance).
    */
  def score(metric: String, a: Column, b: Column): Column = metric match {
    case "COSINE" => cosine(a, b)
    case "L2"     => l2(a, b)
    case "IP"     => ip(a, b)
    case m        => throw new IllegalArgumentException(s"metric $m (want COSINE|L2|IP)")
  }

  def higherIsBetter(metric: String): Boolean = metric != "L2"
}
