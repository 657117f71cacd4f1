package graft

import graft.api._
import graft.sources.VectorStoreCatalog
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Merge-on-read ("delta") ingest mode — `ingest_mode = delta`:
  * commits append one delta file each (no base-table read), readers resolve
  * last-wins per key, [[VectorStoreCatalog.flush]] folds deltas back into
  * the bucket layout. Every behavior here is checked for EQUALITY against
  * the default read-merge-swap (`merge`) mode on the same inserts.
  */
class DeltaIngestSpec extends SparkSpec {

  private def mkCatalog = new VectorStoreCatalog(spark,
    Files.createTempDirectory("graft_delta").toString)

  private def vec(seed: Int, dim: Int = 8): Seq[Double] =
    (0 until dim).map(i => ((seed * 131 + i * 313 + 7) % 97 - 48).toDouble)

  private def row(key: String, seed: Int, m: String, tag: String = "v1") =
    EmbeddedVector(key, s"doc $key $tag spark data", m,
      Map("tag" -> tag), vec(seed))

  private val DeltaProps = Map("ingest_mode" -> "delta")

  private def loadSorted(cat: VectorStoreCatalog, t: String, m: String) =
    cat.load(t, m).select("flouds_vector_id", "chunk", "meta", "vector", "part")
      .orderBy("flouds_vector_id").collect().toSeq

  /** Recursive (path, size) listing — mtime-free so the assert is about
    * CONTENT, not filesystem timestamp granularity.
    */
  private def lsRec(p: Path): Seq[(String, Long)] =
    if (!Files.exists(p)) Nil
    else Files.walk(p).iterator().asScala.filter(Files.isRegularFile(_))
      .map(f => (f.toString, Files.size(f))).toSeq.sortBy(_._1)

  test("delta-mode stored state equals merge-mode on identical insert waves") {
    val cat = mkCatalog
    cat.generateSchema(SchemaSpec("t", "merge-m", dimension = 8))
    cat.generateSchema(SchemaSpec("t", "delta-m", dimension = 8,
      extraProps = DeltaProps))
    assert(cat.ingestMode("t", "delta-m") == "delta")
    assert(cat.ingestMode("t", "merge-m") == "merge")

    // three waves: seeds, replacements of half, fresh adds — the classic
    // churn mix. Replacement seeds 60-79 keep every final vector DISTINCT
    // (vec collides exactly when seeds are congruent mod 97), so search
    // rankings have no ties to break nondeterministically.
    def waves(m: String) = Seq(
      (0 until 40).map(i => row(s"k$i", i, m)),
      (0 until 20).map(i => row(s"k$i", 60 + i, m, tag = "v2")),
      (40 until 60).map(i => row(s"k$i", i, m)))
    waves("merge-m").foreach(cat.insert("t", "merge-m", _))
    waves("delta-m").foreach(cat.insert("t", "delta-m", _))

    val got = loadSorted(cat, "t", "delta-m")
      .map { r => (r.getString(0), r.getString(1), r.getString(2)) }
    val want = loadSorted(cat, "t", "merge-m")
      .map { r => (r.getString(0), r.getString(1), r.getString(2)) }
    // chunks embed the model name; compare modulo that
    assert(got.map(t => (t._1, t._3)) == want.map(t => (t._1, t._3)))
    assert(got.size == 60)
    assert(got.filter(_._1 == "k3").head._2.contains("v2"), "replacement won")

    // dense search parity through the facade (same vectors both modes,
    // all final vectors distinct => unambiguous ranking)
    val rd = cat.search(SearchRequest("t", "delta-m", vec(7), limit = 5))
    val rm = cat.search(SearchRequest("t", "merge-m", vec(7), limit = 5))
    assert(rd.data.map(d => (d.content, d.meta)) ==
      rm.data.map(d => (d.content, d.meta)))
  }

  test("a delta insert writes one pending commit and does not touch the base table") {
    val cat = mkCatalog
    cat.generateSchema(SchemaSpec("t", "d1", dimension = 8, extraProps = DeltaProps))
    cat.insert("t", "d1", (0 until 30).map(i => row(s"k$i", i, "d1")))
    cat.flush("t", "d1") // fold the seed wave into the bucket layout

    val dataDir = cat.tableDir("t", "d1").resolve("data")
    val deltaDir = cat.tableDir("t", "d1").resolve("_delta")
    val before = lsRec(dataDir)
    assert(before.nonEmpty && lsRec(deltaDir).isEmpty)

    // replacement seeds 30-39: distinct mod 97 from the kept keys' 10-29
    cat.insert("t", "d1", (0 until 10).map(i => row(s"k$i", 30 + i, "d1", "v2")))

    assert(lsRec(dataDir) == before,
      "delta insert must not rewrite any base-table file")
    val pending = Files.list(deltaDir).iterator().asScala.toSeq
    assert(pending.size == 1, s"exactly one pending commit, got $pending")
    // and the merge-on-read view already serves the replacement
    val r = cat.search(SearchRequest("t", "d1", vec(33), limit = 1))
    assert(r.data.head.content.contains("doc k3 v2"))
    assert(cat.load("t", "d1").count() == 30)
  }

  test("last-wins across multiple pending delta commits, then flush folds identically") {
    val cat = mkCatalog
    cat.generateSchema(SchemaSpec("t", "d2", dimension = 8, extraProps = DeltaProps))
    cat.insert("t", "d2", Seq(row("k0", 1, "d2", "v1"), row("k1", 2, "d2", "v1")))
    cat.insert("t", "d2", Seq(row("k0", 3, "d2", "v2")))
    cat.insert("t", "d2", Seq(row("k0", 4, "d2", "v3"), row("k2", 5, "d2", "v1")))

    def view = cat.load("t", "d2")
      .select("flouds_vector_id", "meta").orderBy("flouds_vector_id")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val pre = view
    assert(pre.size == 3)
    assert(pre.find(_._1 == "k0").get._2.contains("v3"), "newest commit wins")

    cat.flush("t", "d2")
    val deltaDir = cat.tableDir("t", "d2").resolve("_delta")
    assert(!Files.exists(deltaDir) ||
      Files.list(deltaDir).iterator().asScala.isEmpty, "fold drops the deltas")
    assert(view == pre, "folding must not change the served view")
  }

  test("auto-flush folds only past the max_delta_files threshold") {
    val cat = mkCatalog
    // batches of 100 reach AutoFlushMinBatch, so every insert runs the
    // auto-flush decision; the delta gate defers folding until >2 pending
    cat.generateSchema(SchemaSpec("t", "d3", dimension = 8,
      extraProps = DeltaProps + ("max_delta_files" -> "2")))
    val deltaDir = cat.tableDir("t", "d3").resolve("_delta")
    def pending = if (!Files.exists(deltaDir)) 0
      else Files.list(deltaDir).iterator().asScala.size

    cat.insert("t", "d3", (0 until 100).map(i => row(s"a$i", i, "d3")))
    assert(pending == 1)
    cat.insert("t", "d3", (0 until 100).map(i => row(s"b$i", 200 + i, "d3")))
    assert(pending == 2)
    cat.insert("t", "d3", (0 until 100).map(i => row(s"c$i", 400 + i, "d3")))
    assert(pending == 0, "third commit crosses the threshold and folds")
    assert(cat.load("t", "d3").count() == 300)
  }

  test("small-batch delta ingest still folds past max_delta_files (bounded pending set)") {
    val cat = mkCatalog
    // batches FAR below AutoFlushMinBatch (100) — the high-churn small-batch
    // workload the mode targets. The fold decision must fire on the
    // pending-commit count alone; nesting it under the batch-size gate (the
    // r5 shape) let the pending set grow without bound, breaking loadRaw's
    // "≤ max_delta_files+1, always broadcastable" invariant.
    cat.generateSchema(SchemaSpec("t", "d6", dimension = 8,
      extraProps = DeltaProps + ("max_delta_files" -> "3")))
    val deltaDir = cat.tableDir("t", "d6").resolve("_delta")
    def pending = if (!Files.exists(deltaDir)) 0
      else Files.list(deltaDir).iterator().asScala.size
    for (w <- 1 to 10)
      cat.insert("t", "d6", (0 until 5).map(i => row(s"w${w}_$i", w * 10 + i, "d6")))
    assert(pending <= 4, s"pending deltas must stay bounded, got $pending")
    assert(cat.load("t", "d6").count() == 50)
  }

  test("merge-on-read view broadcasts the delta keys — the base side never shuffles") {
    val cat = mkCatalog
    cat.generateSchema(SchemaSpec("t", "d5", dimension = 8, extraProps = DeltaProps))
    cat.insert("t", "d5", (0 until 50).map(i => row(s"k$i", i, "d5")))
    cat.flush("t", "d5")
    cat.insert("t", "d5", (0 until 5).map(i => row(s"k$i", 50 + i, "d5", "v2")))

    val plan = cat.load("t", "d5").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"delta-key anti-join must broadcast, got:\n$plan")
    // the only shuffle is the window over the (small) delta rows — the base
    // scan must not feed an exchange
    val baseSide = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(!plan.contains("SortMergeJoin"),
      s"base side must not sort-merge against the deltas:\n$baseSide")
  }

  test("delta inserts keep a persisted IVF index fresh (replacements not stale)") {
    val cat = mkCatalog
    cat.generateSchema(SchemaSpec("t", "d4", dimension = 8, extraProps = DeltaProps))
    cat.insert("t", "d4", (0 until 200).map(i => row(s"k$i", i, "d4")))
    cat.persistIndex("t", "d4")

    // replace k7 with a vector far from its old one (vec collides mod 97,
    // so vec(9999)=vec(8): k7's new row ties exactly with k8 and k105 —
    // all three must surface, and k7 must surface as v2), through a pure
    // delta commit against the indexed collection
    cat.insert("t", "d4", Seq(row("k7", 9999, "d4", "v2")))
    val r = cat.search(SearchRequest("t", "d4", vec(9999), limit = 3))
    val k7hit = r.data.find(_.content.contains("doc k7 "))
    assert(k7hit.nonEmpty && k7hit.get.content.contains("v2"),
      s"replaced k7 not served from the index: ${r.data.map(_.content)}")
    // and the old location must not serve the stale pre-replacement row
    val old = cat.search(SearchRequest("t", "d4", vec(7), limit = 3))
    assert(!old.data.exists(d => d.content.contains("doc k7 v1")),
      "stale pre-replacement row served from the clustered index")
  }
}
