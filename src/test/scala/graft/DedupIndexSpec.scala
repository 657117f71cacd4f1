package graft

import graft.operators.Dedup
import graft.sources.DedupIndex
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path}
import java.security.MessageDigest
import scala.jdk.CollectionConverters._

/** Persisted incremental MinHash-LSH index: the stored tables must be
  * bit-equal to the batch operators' output after any build/upsert mix,
  * queries must read index-bounded, and commits must leave untouched
  * partition dirs byte-identical.
  */
class DedupIndexSpec extends SparkSpec {
  import spark.implicits._

  private def doc(i: Long, tag: String = "v1") =
    (i, s"shared prefix tokens $tag alpha beta doc$i gamma delta common tail words")

  private def docs(ids: Seq[Long], tag: String = "v1") =
    ids.map(doc(_, tag)).toDF("doc_id", "text")

  private def snapshot(root: Path): Map[String, String] =
    if (!Files.exists(root)) Map.empty
    else {
      val s = Files.walk(root)
      try s.iterator().asScala
        .filter(p => Files.isRegularFile(p) && !p.getFileName.toString.startsWith("_SUCCESS"))
        .map { p =>
          val md = MessageDigest.getInstance("MD5").digest(Files.readAllBytes(p))
          root.relativize(p).toString -> md.map("%02x".format(_)).mkString
        }.toMap
      finally s.close()
    }

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("build + upserts equal a from-scratch build over the merged corpus") {
    val dir = Files.createTempDirectory("graft_dedupidx").toString
    DedupIndex.build(docs(0L until 60L), dir, nBuckets = 8)
    // wave 1 replaces 10 docs with new text and adds 20 fresh
    DedupIndex.upsert(spark, dir, docs((50L until 80L), tag = "v2"), nBuckets = 8)
    // wave 2 replays 5 of wave 1's docs verbatim (idempotent replace)
    DedupIndex.upsert(spark, dir, docs((60L until 65L), tag = "v2"), nBuckets = 8)

    val merged = docs(0L until 50L)
      .unionByName(docs(50L until 80L, tag = "v2"))
    val refDir = Files.createTempDirectory("graft_dedupref").toString
    DedupIndex.build(merged, refDir, nBuckets = 8)

    def sig(d: String) = spark.read.parquet(s"$d/sig").drop("_bucket")
    def bands(d: String) = spark.read.parquet(s"$d/bands")
      .select("doc_id", "bucket", "_band", "_bb")
    assert(canon(sig(dir)) == canon(sig(refDir)), "signatures != rebuild")
    assert(canon(bands(dir)) == canon(bands(refDir)), "band postings != rebuild")
  }

  test("queryBatch equals the batch LSH operator restricted to (new x stored) pairs") {
    val dir = Files.createTempDirectory("graft_dedupq").toString
    val corpus = docs(0L until 80L)
    DedupIndex.build(corpus, dir, nBuckets = 8)
    val batch = docs(200L until 220L).unionByName(docs(Seq(5L, 17L), tag = "v3"))

    val got = DedupIndex.queryBatch(spark, dir, batch, nBuckets = 8)

    // reference: the BATCH operator over corpus ∪ batch, with batch ids
    // remapped out of the corpus id space (queries 5/17 carry NEW text but
    // the index still stores their v1 rows — the query must see the stored
    // state, not a replaced corpus). Keep pairs crossing the boundary,
    // query-first; drop same-id pairs (queryBatch's self-match exclusion).
    val Off = 100000L
    val remapped = batch.withColumn("doc_id", col("doc_id") + Off)
    val all = Dedup.lshCandidatePairs(
      Dedup.minhashSignatures(corpus.unionByName(remapped)))
    val want = all.collect().flatMap { r =>
      val (a, b, s) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      // lshCandidatePairs emits doc_a < doc_b once; orient query-first
      Seq((a, b, s), (b, a, s)).filter { case (q, m, _) => q >= Off && m < Off }
        .map { case (q, m, sim) => (q - Off, m, sim) }
        .filter { case (q, m, _) => q != m }
    }.toSet
    assert(canon(got) == want.map(t => Seq(t._1.toDouble, t._2.toDouble, t._3)),
      s"got ${canon(got).size} pairs, want ${want.size}")
    assert(want.nonEmpty, "fixture must produce cross pairs")
  }

  test("upsert rewrites only the touched sig buckets and affected band dirs") {
    val base = Files.createTempDirectory("graft_dedupb")
    val dir = base.toString
    DedupIndex.build(docs(0L until 64L), dir, nBuckets = 8)
    val before = snapshot(base)
    DedupIndex.upsert(spark, dir, docs(Seq(7L), tag = "v2"), nBuckets = 8)
    val after = snapshot(base)

    val changed = (before.keySet ++ after.keySet)
      .filter(p => before.get(p) != after.get(p))
    // the single-doc batch touches sig bucket 7%8 and ≤ 8 band dirs
    // (4 old + 4 new keys)
    assert(changed.exists(_.startsWith("sig/_bucket=7/")), "touched bucket rewritten")
    assert(!changed.exists(p => p.startsWith("sig/") && !p.startsWith("sig/_bucket=7/")),
      s"untouched sig buckets changed: $changed")
    val bandDirs = changed.filter(_.startsWith("bands/"))
      .map(p => p.split("/").take(2).mkString("/")).toSet
    assert(bandDirs.size <= 8, s"too many band dirs rewritten: $bandDirs")
    // and untouched files are byte-identical
    val untouched = before.keySet -- changed
    assert(untouched.forall(p => after.get(p) == before.get(p)))
  }

  test("ingestDeduped gates micro-batches against the corpus and grows the index") {
    val dir = Files.createTempDirectory("graft_dedupgate").toString
    // wave 1 seeds the corpus (empty index: everything survives)
    val w1 = DedupIndex.ingestDeduped(spark, dir, docs(0L until 30L), 0.75, nBuckets = 8)
    assert(w1.count() == 30)
    // wave 2: 10 near-verbatim re-crawls (new ids, same text modulo doc id
    // token) + 10 genuinely fresh docs with disjoint vocabulary
    val fresh = (100L until 110L)
      .map(i => (i, s"totally different vocabulary item$i unique$i content$i")).toDF("doc_id", "text")
    val recrawl = (200L until 210L).map(i => doc(i - 200L)).toDF("doc_id", "text")
      .withColumn("doc_id", col("doc_id") + 200L)
    val w2 = DedupIndex.ingestDeduped(spark, dir,
      recrawl.unionByName(fresh), 0.75, nBuckets = 8)
    val kept = w2.select("doc_id").as[Long].collect().toSet
    assert((100L until 110L).forall(kept), s"fresh docs must survive: $kept")
    assert(!(200L until 210L).exists(kept), s"re-crawled dups must be dropped: $kept")
    // survivors (and only they) are now in the index
    def sigIds = spark.read.parquet(s"$dir/sig").select("doc_id").as[Long].collect().toSet
    assert((100L until 110L).forall(sigIds) && !(200L until 210L).exists(sigIds))
  }

  test("queryBatch reads only the query's band partitions (static pruning)") {
    val dir = Files.createTempDirectory("graft_dedupp").toString
    DedupIndex.build(docs(0L until 80L), dir, nBuckets = 8)

    // AQE wraps subplans in query stages TreeNode.collect can't descend
    // into — plan-shape asserts need the static plan (see PlanShapeSpec)
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
    def scansOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
    // the band-postings read: a 1-doc query has ≤4 band keys → ≤4 of the
    // 4·64 partition dirs survive pruning
    val bandScan = scansOf(DedupIndex.prunedBandScan(spark, dir,
      Seq((0, 3L), (1, 7L), (2, 11L), (3, 13L))))
    assert(bandScan.nonEmpty)
    bandScan.foreach { s =>
      assert(s.metadata.get("PartitionFilters").exists(_.contains("_band")),
        s"no partition filters on bands scan: ${s.metadata.get("PartitionFilters")}")
      assert(s.selectedPartitions.partitionCount <= 4,
        "bands scan must prune to the query's partitions")
    }
    // and the candidate sig lookup in the full query plan is bucket-pruned
    // (a near-identical query doc guarantees candidates — an empty
    // candidate set collapses the plan to an empty local relation)
    val q = DedupIndex.queryBatch(spark, dir, docs(Seq(300L)), nBuckets = 8)
    assert(q.count() > 0, "fixture must produce candidates")
    val sigScans = scansOf(q).filter(_.schema.fieldNames.contains("h0"))
    assert(sigScans.nonEmpty)
    sigScans.foreach { s =>
      assert(s.metadata.get("PartitionFilters").exists(_.contains("_bucket")),
        s"sig lookup not bucket-pruned: ${s.metadata.get("PartitionFilters")}")
    }
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
  }

  test("over-cap queryBatch keeps signatures off the driver and matches the fast path") {
    val dir = Files.createTempDirectory("graft_dedupcap").toString
    DedupIndex.build(docs(0L until 80L), dir, nBuckets = 8)
    val batch = docs(200L until 230L).unionByName(docs(Seq(5L, 17L, 42L), tag = "v3"))
    // cap of 4 forces the distributed path for this 33-doc batch; the
    // result must be bit-identical to the broadcast fast path (same
    // band-pruned join shape, different physicality only)
    val slow = DedupIndex.queryBatch(spark, dir, batch, nBuckets = 8, maxBroadcast = 4)
    val fast = DedupIndex.queryBatch(spark, dir, batch, nBuckets = 8)
    assert(canon(fast).nonEmpty, "fixture must produce candidate pairs")
    assert(canon(slow) == canon(fast), "distributed path diverges from broadcast path")
  }
}
