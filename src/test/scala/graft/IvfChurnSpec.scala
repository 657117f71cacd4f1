package graft

import graft.api._
import graft.sources.VectorStoreCatalog
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** IVF drift bound under sustained insert churn: the incremental cell
  * rewrite keeps the clustered table EXACT against the stored centroids,
  * but the centroids and quantizer params stay frozen at build time — a
  * shifted ingest distribution piles into its few nearest cells. After
  * `ivf_max_absorbs` absorbs the index retrains from the current data
  * table (fresh KMeans + quantizer refit), the same bounded-debt shape as
  * `hnsw_max_absorbs` and the delta fold's `max_delta_files`.
  */
class IvfChurnSpec extends SparkSpec {

  // region A: components in [-48, 48]; region B: the same lattice shifted
  // +1000 — far outside anything the A-trained centroids cover
  private def avec(seed: Int): Seq[Double] =
    (0 until 8).map(i => ((seed * 131 + i * 313 + 7) % 97 - 48).toDouble)
  private def bvec(seed: Int): Seq[Double] = avec(seed).map(_ + 1000.0)

  test("absorb counter increments per insert and a retrain clears drift") {
    val cat = new VectorStoreCatalog(spark,
      Files.createTempDirectory("graft_ivf_churn").toString)
    cat.generateSchema(SchemaSpec("t", "m", dimension = 8, nlist = 4,
      extraProps = Map("ivf_max_absorbs" -> "2")))
    cat.insert("t", "m", (0 until 100).map(i =>
      EmbeddedVector(s"a$i", s"adoc $i", "m", Map(), avec(i))))
    cat.persistIndex("t", "m")
    assert(cat.ivfAbsorbCount("t", "m") == 0, "fresh build owes no absorbs")
    val centroidsBefore = cat.loadIndex("t", "m").centroids.collect()
      .map(r => r.getSeq[Double](r.fieldIndex("center")).toVector).toSet

    // drifted churn: batches land far from every trained centroid
    cat.insert("t", "m", (0 until 20).map(i =>
      EmbeddedVector(s"b$i", s"bdoc $i", "m", Map(), bvec(i))))
    assert(cat.ivfAbsorbCount("t", "m") == 1)
    cat.insert("t", "m", (20 until 40).map(i =>
      EmbeddedVector(s"b$i", s"bdoc $i", "m", Map(), bvec(i))))
    assert(cat.ivfAbsorbCount("t", "m") == 2)

    // the absorbed-but-not-retrained index still serves EXACT results for
    // drifted keys (each cell rewrite is exact against the old centroids)
    val preHit = cat.search(SearchRequest("t", "m", bvec(5), limit = 1))
    assert(preHit.success && preHit.data.head.content == "bdoc 5",
      s"drifted key must be servable pre-retrain, got ${preHit.data.headOption}")

    // third absorb crosses ivf_max_absorbs=2: the retrain is SCHEDULED
    // (detached from the insert — r12) and the counter resets at schedule
    // time; the triggering batch is still served immediately via the old
    // generation's incremental absorb
    cat.insert("t", "m", (40 until 60).map(i =>
      EmbeddedVector(s"b$i", s"bdoc $i", "m", Map(), bvec(i))))
    assert(cat.ivfAbsorbCount("t", "m") == 0,
      "crossing ivf_max_absorbs must schedule a retrain and reset the counter")
    val preRetrain = cat.search(SearchRequest("t", "m", bvec(45), limit = 1))
    assert(preRetrain.success && preRetrain.data.head.content == "bdoc 45",
      "the triggering batch must be servable before the detached retrain lands")
    cat.awaitRebuilds("t", "m")

    // the retrain actually re-ran KMeans over the merged distribution:
    // centroids changed, and at least one covers region B
    val centroidsAfter = cat.loadIndex("t", "m").centroids.collect()
      .map(r => r.getSeq[Double](r.fieldIndex("center")).toVector).toSet
    assert(centroidsAfter != centroidsBefore, "retrain must move centroids")
    assert(centroidsAfter.exists(_.head > 400.0),
      s"no centroid covers the drifted region: ${centroidsAfter.map(_.head)}")

    // the triggering batch landed in the retrained index, and old keys
    // survived the retrain
    val freshHit = cat.search(SearchRequest("t", "m", bvec(45), limit = 1))
    assert(freshHit.success && freshHit.data.head.content == "bdoc 45")
    val oldHit = cat.search(SearchRequest("t", "m", avec(7), limit = 1))
    assert(oldHit.success && oldHit.data.head.content == "adoc 7")
  }

  test("explicit persistIndex resets the absorb counter") {
    val cat = new VectorStoreCatalog(spark,
      Files.createTempDirectory("graft_ivf_churn2").toString)
    cat.generateSchema(SchemaSpec("t", "m", dimension = 8, nlist = 4))
    cat.insert("t", "m", (0 until 80).map(i =>
      EmbeddedVector(s"a$i", s"adoc $i", "m", Map(), avec(i))))
    cat.persistIndex("t", "m")
    cat.insert("t", "m", Seq(EmbeddedVector("x1", "xdoc", "m", Map(), avec(200))))
    assert(cat.ivfAbsorbCount("t", "m") == 1)
    cat.persistIndex("t", "m")
    assert(cat.ivfAbsorbCount("t", "m") == 0)
  }
}
