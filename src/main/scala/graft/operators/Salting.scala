package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling join: salt the skewed (big) side's key into `saltFactor`
  * sub-keys and explode the small side across all salts, so one hot key
  * spreads over `saltFactor` reducers instead of one straggler task.
  *
  * AQE's skew-join handles sort-merge skew automatically at runtime; this
  * explicit variant covers aggregate-style skew and engines/plans AQE can't
  * rewrite (and makes the technique testable). Salt assignment is
  * deterministic (hash of a row-unique column), so results are stable.
  */
object Salting {

  /** Inner-join `big ⋈ small` on `key`, salting `big` by `saltBy` (a
    * row-unique column of `big`, e.g. its PK).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, saltBy: String,
      saltFactor: Int = 8): DataFrame = {
    require(saltFactor >= 1, "saltFactor >= 1")
    val salted = big.withColumn("_salt",
      pmod(xxhash64(col(saltBy)), lit(saltFactor)).cast("int"))
    val exploded = small.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(exploded, Seq(key, "_salt")).drop("_salt")
  }

  /** Skewed aggregation: count per key via two-phase salt -> partial ->
    * final, spreading hot keys across reducers in phase one.
    */
  def saltedCount(df: DataFrame, key: String, saltBy: String,
      saltFactor: Int = 8): DataFrame =
    df.withColumn("_salt", pmod(xxhash64(col(saltBy)), lit(saltFactor)))
      .groupBy(col(key), col("_salt")).agg(count(lit(1)).as("_partial"))
      .groupBy(col(key)).agg(sum("_partial").as("cnt"))
}
