package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch upsert semantics of the reference's insert path
  * (`/root/reference/app/milvus/vector_store.py:292-404`): upsert-by-PK with
  * duplicate-key rejection inside a batch
  * (`app/models/insert_request.py:89-104`) and a batch cap of 1000 rows.
  *
  * Without Delta in this environment the MERGE is expressed relationally:
  * `current ANTI-JOIN batch  UNION ALL  batch` — the same plan a Delta MERGE
  * compiles to (join on the merge key). At scale both sides shuffle on the
  * key once; with a bucketed table layout the anti-join is co-located.
  */
object Upsert {

  val MaxBatch = 1000

  /** Duplicate keys inside a batch (must be empty for a valid request). */
  def batchDuplicates(batch: DataFrame, key: String): DataFrame =
    batch.groupBy(key).count().filter(col("count") > 1)

  /** Validate a batch like the reference's Pydantic layer: non-empty,
    * ≤1000 rows, unique non-null keys. Throws IllegalArgumentException.
    */
  def validateBatch(batch: DataFrame, key: String): Unit = {
    val n = batch.count()
    require(n >= 1 && n <= MaxBatch, s"batch size $n not in 1..$MaxBatch")
    require(batch.filter(col(key).isNull).isEmpty, "null keys in batch")
    require(batchDuplicates(batch, key).isEmpty, "duplicate keys in batch")
  }

  /** MERGE: rows in `current` whose key appears in `batch` are replaced;
    * new keys are appended. Column sets must match.
    */
  def merge(current: DataFrame, batch: DataFrame, key: String): DataFrame =
    current.join(batch.select(key), Seq(key), "left_anti")
      .unionByName(batch.select(current.columns.map(col).toSeq: _*))
}
