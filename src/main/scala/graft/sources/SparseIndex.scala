package graft.sources

import graft.operators.Bm25
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Durable form of the BM25 sparse index (D4) — the reference always searches
  * through its built sparse index (`/root/reference/app/milvus/base_milvus
  * .py:1286-1310`); this is the table set that makes that possible without
  * ever re-fitting over the corpus at query time.
  *
  * Layout under `dir`:
  *   tf/_bucket=N       (doc_id, term, tf)   — the posting lists, bucketed by
  *                                             pmod(doc_id, nBuckets)
  *   doclen/_bucket=N   (doc_id, dl)
  *   termdf/            (term, df)           — the term dictionary
  *   global/            (n, sumdl)           — single row
  *
  * Scale shape: an upsert batch touches only the bucket directories its
  * doc_ids hash to — tf/doclen updates are O(batch); `termdf` / `global` are
  * updated by DELTA (df ± per-term counts from the removed/added posting
  * rows), and the dictionary delta is APPENDED (`termdf_delta/`) rather than
  * folded into a rewrite, so the steady-state commit is O(batch tokens) —
  * independent of corpus size AND vocabulary size. Readers resolve the
  * dictionary as base + pending deltas (commutative integer sums); every
  * `maxTermDeltas` commits (or on [[foldTermDeltas]]) the view folds back
  * into the bucketed base. This is [[Bm25.removeDocs]] + [[Bm25.mergeStats]]
  * (spec-proven equal to a refit) realized incrementally on storage. On a
  * cluster the four tables would be Delta and the swap a MERGE; the
  * operators above are storage-agnostic.
  */
object SparseIndex {

  def exists(dir: String): Boolean = Files.exists(Paths.get(dir, "global"))

  /** All table reads tolerate files vanishing between listing and read
    * (`ignoreMissingFiles`) — a lock-free reader racing a concurrent swap
    * sees old, new, or absent per file (a transient undercount), never an
    * exception. Commit-side reads run under the collection lock, where
    * nothing vanishes — the option is inert there.
    */
  private def pread(spark: SparkSession) =
    spark.read.option("ignoreMissingFiles", "true")

  private def bucketOf(docId: org.apache.spark.sql.Column, nBuckets: Int) =
    pmod(docId, lit(nBuckets.toLong))

  /** The dictionary's own bucketing: `termdf/_tbucket=pmod(xxhash64(term),
    * 64)`. 64 buckets so a ≤10-term query prunes to ≲15% of the vocabulary
    * dirs; the dictionary is small, so 64 dirs cost nothing on write.
    */
  val TermBuckets = 64

  private def termBucketCol =
    pmod(xxhash64(col("term")), lit(TermBuckets.toLong))

  /** Driver-side twin of [[termBucketCol]] (same XxHash64(seed=42) as the
    * `xxhash64` function — parity spec-pinned with the catalog's key twin).
    */
  private[graft] def termBucketOf(term: String): Long = {
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(term),
      org.apache.spark.sql.types.StringType, 42L)
    ((h % TermBuckets) + TermBuckets) % TermBuckets
  }

  /** Bucketed vs legacy-flat dictionary layout (pre-r5 indexes wrote one
    * flat parquet). Legacy reads stay correct (bucket column synthesized);
    * the next upsert rewrites the dictionary bucketed.
    */
  private def termDfBucketed(dir: String): Boolean =
    listChildren(Paths.get(dir, "termdf"))
      .exists(_.getFileName.toString.startsWith("_tbucket="))

  /** Pending dictionary-delta commits (`termdf_delta/d*` dirs): each upsert
    * appends one batch-vocabulary-sized (term, ±df) file instead of
    * rewriting the whole dictionary — the dictionary analogue of the data
    * table's merge-on-read mode, and the removal of the last O(vocabulary)
    * write from the steady-state insert. Deltas fold back into the bucketed
    * base layout every `maxTermDeltas` commits (or on an explicit
    * [[foldTermDeltas]]).
    */
  private def termDeltaDir(dir: String): Path = Paths.get(dir, "termdf_delta")

  /** Closed-stream directory listing ([[VectorStoreCatalog.listChildren]])
    * — these listings run per search request via `termDfPruned`, so an
    * unclosed `Files.list` stream would leak one fd per request.
    */
  private def listChildren(p: Path): Seq[Path] =
    VectorStoreCatalog.listChildren(p)

  /** Live dictionary-delta commits. Object-store semantics: published dirs
    * only — an unpublished `dNNN` is a torn copy-then-delete append
    * ([[FsOps]]) and must not contribute counts. POSIX semantics: an
    * unpublished dir is complete (atomic move) — legacy pre-marker commits
    * included — and is backfill-published rather than silently dropped.
    */
  private def termDeltaFiles(dir: String): Seq[Path] = {
    val f = VectorStoreCatalog.fs
    val dirs = listChildren(termDeltaDir(dir))
      .filter(d => d.getFileName.toString.startsWith("d"))
      .sortBy(_.toString)
    if (f.atomicMoves) {
      dirs.filterNot(f.isPublished)
        .foreach(d => scala.util.Try(f.publish(d)))
      dirs.filter(Files.exists(_))
    } else dirs.filter(f.isPublished)
  }

  /** Persisted monotonic commit sequence for dictionary-delta file names —
    * the dictionary twin of the data table's `nextDeltaSeq`
    * ([[VectorStoreCatalog]]). Driver-side read+increment under the
    * caller's collection lock: no Spark job, no arithmetic over hash
    * values. (The r5 content-hash name summed `xxhash64(term, df)` — a sum
    * of uniform longs overflows with near-certainty beyond a few dozen
    * terms, and Spark 4's default ANSI mode turns that into
    * `SparkArithmeticException`; content-addressing was also WRONG, not
    * just fragile: two different sequential commits with identical delta
    * content — same text inserted under two keys — collided on one name
    * and silently lost a df contribution.)
    */
  private def nextDeltaSeq(dir: String): Long = {
    // named into the termdf_* family: the dictionary commit owns it (and
    // the touched-bucket isolation spec treats dictionary files as the
    // small always-updatable tables)
    val p = Paths.get(dir, "termdf_delta_seq")
    // a corrupt/unparseable counter (torn write by a pre-atomic version,
    // disk fault) must not wedge every subsequent insert: recover as
    // max(existing d*)+1 — collision-free against every LIVE delta file,
    // which is the only collision that loses data (folded generations are
    // deleted, so name reuse across folds is inert). The same max() also
    // heals a stale-but-parseable counter lagging the delta dir.
    // collision scan over ALL existing dirs — including UNPUBLISHED (torn)
    // ones a crashed commit stranded: reusing such a name would merge a new
    // commit's files into torn debris and then publish the mixture
    val maxLive = listChildren(termDeltaDir(dir))
      .filter(_.getFileName.toString.startsWith("d"))
      .flatMap(d => scala.util.Try(d.getFileName.toString.drop(1).toLong).toOption)
      .maxOption.getOrElse(0L)
    val stored =
      if (Files.exists(p))
        scala.util.Try(new String(Files.readAllBytes(p), "UTF-8").trim.toLong).toOption
      else None
    val next = math.max(stored.getOrElse(1L), maxLive + 1)
    Files.createDirectories(p.getParent)
    // tmp + atomic rename: the reservation itself can never tear (the
    // `._tmp` name is vacuum-swept debris if a crash strands it)
    val tmp = p.resolveSibling(p.getFileName.toString + "._tmp" + System.nanoTime())
    Files.write(tmp, (next + 1).toString.getBytes("UTF-8"))
    Files.move(tmp, p, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    next
  }

  /** The dictionary with its `_tbucket` partition column attached, whatever
    * the on-disk layout. With pending delta commits this is the
    * MERGE-ON-READ view: base ∪ deltas, summed per term (commutative
    * integer deltas — apply order is irrelevant), zero-count terms dropped.
    * `_tbucket` stays a GROUPING column so a pruned read's bucket filter
    * pushes below the aggregate to the base partition dirs.
    */
  private def termDfRaw(spark: SparkSession, dir: String): DataFrame = {
    val base =
      if (termDfBucketed(dir))
        pread(spark).schema("term STRING, df LONG, _tbucket LONG")
          .parquet(s"$dir/termdf")
      else
        pread(spark).schema("term STRING, df LONG").parquet(s"$dir/termdf")
          .withColumn("_tbucket", termBucketCol)
    val deltas = termDeltaFiles(dir)
    if (deltas.isEmpty) base
    else base.unionByName(
        pread(spark).schema("term STRING, df LONG, _tbucket LONG")
          .parquet(deltas.map(_.toString): _*))
      .groupBy("_tbucket", "term").agg(sum("df").as("df"))
      .filter(col("df") > 0)
      .select("term", "df", "_tbucket")
  }

  /** Write a full model (initial build / rebuild). One file per bucket
    * (repartition on the bucket key before the partitioned write), so reads
    * are not dominated by per-file overhead.
    */
  def write(m: Bm25.Model, dir: String, nBuckets: Int = 16): Unit = {
    m.tf.withColumn("_bucket", bucketOf(col("doc_id"), nBuckets))
      .repartition(col("_bucket"))
      .write.mode(SaveMode.Overwrite).partitionBy("_bucket").parquet(s"$dir/tf")
    m.docLen.withColumn("_bucket", bucketOf(col("doc_id"), nBuckets))
      .repartition(col("_bucket"))
      .write.mode(SaveMode.Overwrite).partitionBy("_bucket").parquet(s"$dir/doclen")
    m.termDf.withColumn("_tbucket", termBucketCol)
      .repartition(col("_tbucket"))
      .write.mode(SaveMode.Overwrite).partitionBy("_tbucket").parquet(s"$dir/termdf")
    m.global.write.mode(SaveMode.Overwrite).parquet(s"$dir/global")
    // a full (re)build supersedes any pending dictionary deltas — stale
    // ones would double-count against the fresh base
    VectorStoreCatalog.deleteRec(termDeltaDir(dir))
    refresh(m.tf.sparkSession, dir)
  }

  /** Load the persisted model. Scoring through [[Bm25.searchTopK]] on this
    * model joins only these stored tables — no corpus scan, no tokenization.
    * Schemas are explicit so an EMPTY collection's index (a partitioned
    * write of zero rows leaves no parquet files to infer from) still reads
    * as an empty model instead of failing schema inference.
    */
  def read(spark: SparkSession, dir: String): Bm25.Model = Bm25.Model(
    pread(spark).schema("doc_id LONG, term STRING, tf LONG")
      .parquet(s"$dir/tf").select("doc_id", "term", "tf"),
    pread(spark).schema("doc_id LONG, dl LONG")
      .parquet(s"$dir/doclen").select("doc_id", "dl"),
    termDfRaw(spark, dir).select("term", "df"),
    pread(spark).schema("n LONG, sumdl LONG").parquet(s"$dir/global"),
    storedStats = true,
    // per-request dictionary lookups prune to the query terms' hash
    // buckets — a static partition filter over the `_tbucket=` dirs
    termDfPruned = Some(terms => termDfRaw(spark, dir)
      .filter(col("_tbucket").isin(terms.map(termBucketOf).distinct: _*))
      .select("term", "df")))

  /** A computed-but-not-yet-committed incremental upsert: `add` is the
    * batch-only model; `termDf` is the UPDATED (post-delta) dictionary view
    * RESTRICTED to the batch's terms — everything the batch's encoder (its
    * only steady-state consumer) can consult — and `global` the updated
    * globals. `global` and the batch's dictionary
    * delta are MATERIALIZED (localCheckpoint); in steady state `termDf`
    * stays a LAZY view over immutable sources (base + explicitly-listed
    * pending deltas + the pinned batch delta — the commit only APPENDS,
    * so re-evaluation cannot race a swap). On a fold iteration `termDf`
    * is pinned too, because the fold's commit swaps the dictionary base.
    * [[commit]] runs the tmp writes + swaps; callers overlap it with their
    * data-table commit (the two write disjoint directory families).
    */
  final case class Pending(add: Bm25.Model, termDf: DataFrame,
      global: DataFrame, commit: () => Unit)

  /** Fold any pending dictionary deltas into the bucketed base (the
    * explicit-compaction hook — upserts also fold automatically every
    * `maxTermDeltas` commits). Idempotent; a no-op without pending deltas.
    */
  def foldTermDeltas(spark: SparkSession, dir: String): Unit = {
    val pending = termDeltaFiles(dir)
    if (pending.isEmpty) return
    val folded = termDfRaw(spark, dir)
      .groupBy("term").agg(sum("df").as("df")).filter(col("df") > 0)
      .localCheckpoint() // pin before the swap invalidates the lazy sources
    val base = Paths.get(dir)
    val tmp = writeTmp(folded.withColumn("_tbucket", termBucketCol),
      base, "termdf", partitionCol = Some("_tbucket"))
    swapDir(tmp, base.resolve("termdf"))
    pending.foreach(VectorStoreCatalog.deleteRec)
    refresh(spark, dir)
  }

  /** Incremental upsert: replace the stats of `batchDocs` (doc_id, text) —
    * tokenizes ONLY the batch, rewrites ONLY the touched tf/doclen buckets,
    * and applies count deltas to termdf/global. Equal to
    * `write(Bm25.fit(mergedCorpus))` (IncrementalSparseSpec). Returns the
    * batch-only model so callers can encode the batch without re-tokenizing.
    */
  def upsert(spark: SparkSession, dir: String, batchDocs: DataFrame,
      nBuckets: Int = 16, knownTouched: Option[Seq[Long]] = None,
      broadcastBatch: Boolean = false, maxTermDeltas: Int = 16): Bm25.Model = {
    val p = prepareUpsert(spark, dir, batchDocs, nBuckets, knownTouched,
      broadcastBatch, maxTermDeltas)
    p.commit()
    p.add
  }

  /** The compute phase of [[upsert]]: everything up to (but excluding) the
    * tmp writes and swaps. The returned updated stats let the caller encode
    * the batch WITHOUT waiting for the bucket rewrites, so the sparse commit
    * can run concurrently with the caller's data-table commit instead of
    * serializing ~2 job latencies ahead of it.
    */
  def prepareUpsert(spark: SparkSession, dir: String, batchDocs: DataFrame,
      nBuckets: Int = 16, knownTouched: Option[Seq[Long]] = None,
      broadcastBatch: Boolean = false, maxTermDeltas: Int = 16,
      beforeRenames: () => Unit = () => (),
      knownDocIds: Option[Seq[Long]] = None): Pending = {
    val add = Bm25.fit(batchDocs) // batch-only tokenization
    if (!exists(dir))
      // the initial build overwrites the live dirs directly (there is no
      // prior state to preserve), so it counts as "renames begun" for the
      // caller's torn-commit marker; `global` is written LAST, making
      // [[exists]] the build's own commit record — a crash mid-build reads
      // back as "no index" and the next insert rebuilds from scratch
      return Pending(add, add.termDf, add.global,
        () => { beforeRenames(); write(add, dir, nBuckets) })
    // request-sized batches broadcast their id set into every slice join (a
    // checkpointed batch has no stats — without the hint these are
    // sort-merge); unbounded insertDf batches keep the shuffle plans
    def bb(df: DataFrame) = if (broadcastBatch) broadcast(df) else df
    // driver-known ids become a LOCAL relation: its broadcast builds with
    // no Spark job, where a projection of the (checkpointed) batch costs
    // one scheduled job per join build — 4 slice joins below
    val batchIds = knownDocIds.fold(batchDocs.select("doc_id"))(ids =>
      spark.createDataset(ids)(org.apache.spark.sql.Encoders.scalaLong)
        .toDF("doc_id"))
    // the catalog buckets data and sparse tables by the SAME hash
    // (pmod(xxhash64(pk), n) = pmod(doc_id, n)), so a caller that already
    // collected its touched buckets passes them instead of a second job
    val touched = knownTouched.map(_.toIndexedSeq).getOrElse(batchIds
      .select(bucketOf(col("doc_id"), nBuckets).as("_bucket"))
      .distinct().collect().map(_.getLong(0)).toIndexedSeq)

    // Touched-bucket slices of the stored per-doc tables (partition-pruned;
    // explicit schemas so an empty index still reads)
    val tfSlice = pread(spark).schema("doc_id LONG, term STRING, tf LONG, _bucket LONG")
      .parquet(s"$dir/tf")
      .filter(col("_bucket").isin(touched: _*)).select("doc_id", "term", "tf")
    val dlSlice = pread(spark).schema("doc_id LONG, dl LONG, _bucket LONG")
      .parquet(s"$dir/doclen")
      .filter(col("_bucket").isin(touched: _*)).select("doc_id", "dl")

    // removeDocs ∪ mergeStats on the slice: drop replaced docs' rows, union
    // the batch's (Bm25.removeDocs/mergeStats semantics, applied bucket-local).
    val removedTf = tfSlice.join(bb(batchIds), Seq("doc_id"), "left_semi")
    val removedDl = dlSlice.join(bb(batchIds), Seq("doc_id"), "left_semi")
    val tfOut = tfSlice.join(bb(batchIds), Seq("doc_id"), "left_anti").unionByName(add.tf)
    val dlOut = dlSlice.join(bb(batchIds), Seq("doc_id"), "left_anti").unionByName(add.docLen)

    // The batch's dictionary DELTA: df ±1 per removed/added posting row,
    // batch-vocabulary-sized. Formulated as UNION + one keyed aggregate
    // (folds map-side) — a full-outer-join formulation costs two sort-merge
    // joins (4 extra shuffle/sort stages of fixed latency on the insert
    // path) for the same arithmetic.
    val batchTermDelta = removedTf.select(col("term"), lit(-1L).as("df"))
      .unionByName(add.tf.select(col("term"), lit(1L).as("df")))
      .groupBy("term").agg(sum("df").as("df"))
      .filter(col("df") =!= 0)
      .withColumn("_tbucket", termBucketCol)

    // Steady state APPENDS the delta (termdf_delta/, see termDfRaw) and the
    // dictionary base is never rewritten — the insert carries no
    // O(vocabulary) write. Every `maxTermDeltas` commits the view folds
    // back into the bucketed base: the pre-delta full-rewrite cost,
    // amortized to 1/N inserts. The delta file name is reserved HERE
    // (driver, under the caller's collection lock) so the commit phase
    // below runs no naming job at all.
    val pendingDeltas = termDeltaFiles(dir)
    val foldNow = pendingDeltas.size >= maxTermDeltas
    val deltaSeq = if (foldNow) -1L else nextDeltaSeq(dir)

    // global by delta, same union-aggregate shape: n' = n - removed + added;
    // sumdl likewise.
    val globalOut = pread(spark).schema("n LONG, sumdl LONG").parquet(s"$dir/global")
      .unionByName(removedDl.select(lit(-1L).as("n"), (-col("dl")).as("sumdl")))
      .unionByName(add.docLen.select(lit(1L).as("n"), col("dl").as("sumdl")))
      .agg(coalesce(sum("n"), lit(0L)).as("n"),
        coalesce(sum("sumdl"), lit(0L)).as("sumdl"))

    // Materialize the SMALL tables once (batch delta + single-row globals —
    // both the commit's tmp write and the caller's batch encoding consume
    // them); the two checkpoint jobs are independent, so run them
    // concurrently. The effective dictionary stays a LAZY view: its
    // sources (base + explicitly-listed delta dirs) are immutable under
    // this commit's append, so re-evaluation cannot double-apply anything.
    // Only a fold iteration pins the full dictionary — there the commit
    // swaps the base under the lazy sources (the pre-delta behavior).
    import scala.concurrent.Await
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    import graft.core.PoolPinned
    val (termDeltaM, globalM) = {
      val fT = PoolPinned.future(spark.sparkContext)(batchTermDelta.localCheckpoint())
      val fG = PoolPinned.future(spark.sparkContext)(globalOut.localCheckpoint())
      (Await.result(fT, Duration.Inf), Await.result(fG, Duration.Inf))
    }
    val termDfM =
      if (!foldNow)
        // Restricted to the BATCH's terms before the merge aggregate: the
        // only consumer of a steady-state Pending.termDf is the batch's
        // encoder, which joins on exactly these terms — without the
        // restriction every insert pays a full-vocabulary aggregate
        // (O(vocab) shuffle) to produce df values it never reads. The
        // broadcast semi-join caps the aggregate at O(batch terms); the
        // dictionary SCAN underneath stays O(vocabulary file read) — the
        // remaining per-insert vocabulary term, columnar and shuffle-free.
        termDfRaw(spark, dir).unionByName(termDeltaM)
          .join(broadcast(add.termDf.select("term")), Seq("term"), "left_semi")
          .groupBy("_tbucket", "term").agg(sum("df").as("df"))
          .filter(col("df") > 0)
          .select("term", "df")
      else
        termDfRaw(spark, dir).unionByName(termDeltaM)
          .groupBy("term").agg(sum("df").as("df"))
          .filter(col("df") > 0)
          .localCheckpoint()

    val commit = () => {
      // Commit, phase 1 — JOBS: tmp-write every output (materializes before
      // any mutation). The four tmp writes are independent of each other,
      // only read PRE-commit state, and run as CONCURRENT Spark jobs — on a
      // request-sized batch each is a small fixed-overhead job, and
      // overlapping them takes the sparse commit from 4 sequential job
      // latencies to ~1. A failure ANYWHERE in this phase aborts with the
      // index completely untouched (the r5 bug ran a naming job AFTER the
      // bucket swaps, so its crash left tf/doclen new but termdf/global
      // stale — and replaying could not converge).
      val base = Paths.get(dir)
      CrashHooks.maybe("sparse.beforeJobs")
      import scala.concurrent.Await
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      import graft.core.PoolPinned
      val psc = spark.sparkContext
      val fTf = PoolPinned.future(psc)(writeTmp(
        tfOut.withColumn("_bucket", bucketOf(col("doc_id"), nBuckets)),
        base, "tf", partitionCol = Some("_bucket")))
      val fDl = PoolPinned.future(psc)(writeTmp(
        dlOut.withColumn("_bucket", bucketOf(col("doc_id"), nBuckets)),
        base, "doclen", partitionCol = Some("_bucket")))
      // steady state: write the batch's SMALL delta; fold iterations write
      // the pinned full dictionary (re-bucketed by term hash — also the
      // migration step for legacy flat dictionaries)
      val fTd = PoolPinned.future(psc)(
        if (foldNow) writeTmp(termDfM.withColumn("_tbucket", termBucketCol),
          base, "termdf", partitionCol = Some("_tbucket"))
        else writeTmp(termDeltaM, base, "termdf_pending", partitionCol = None))
      val fG  = PoolPinned.future(psc)(writeTmp(globalM, base, "global", partitionCol = None))
      val tfTmp = Await.result(fTf, Duration.Inf)
      val dlTmp = Await.result(fDl, Duration.Inf)
      val tdTmp = Await.result(fTd, Duration.Inf)
      val gTmp  = Await.result(fG, Duration.Inf)
      // an empty dictionary delta (e.g. a replay of a batch whose commit
      // already completed: every removed row re-adds identically) appends
      // nothing — the replay converges instead of accumulating no-op files
      val emptyDelta = !foldNow && termDeltaM.isEmpty

      // Phase 2 — RENAMES only (no Spark job can fail past this point;
      // same-filesystem moves). On a cluster this whole phase is one table-
      // format transaction; locally each per-directory rename is atomic but
      // the SEQUENCE is not: a hard crash mid-phase tears the index — and
      // for the COUNT tables (termdf/global) a torn state is NOT repaired
      // by replaying the batch. Replay recomputes the same dictionary delta
      // from pre-state tf and appends it AGAIN next to the one the crashed
      // commit already moved in: counts double-apply (and symmetrically,
      // a crash after the tf swaps under-applies on replay, because the
      // recomputed delta is then empty). Idempotent-replay only holds for
      // the PER-DOC tables (tf/doclen — an identical bucket rewrite).
      // Crash recovery is therefore the CALLER's marker protocol
      // ([[VectorStoreCatalog]] `_commit_intent`, armed via `beforeRenames`
      // BEFORE the first move below): a detected torn commit rebuilds this
      // whole index from the data table — the single ground truth — instead
      // of trusting any delta arithmetic over a state of unknown tear.
      beforeRenames()
      CrashHooks.maybe("sparse.beforeRenames")
      if (!foldNow && !emptyDelta) {
        Files.createDirectories(termDeltaDir(dir))
        // seq names are unique by reservation — two commits (or two
        // different batches with IDENTICAL delta content, which the r5
        // content-address silently collapsed) can never collide
        VectorStoreCatalog.fs.moveAndPublish(
          tdTmp, termDeltaDir(dir).resolve(f"d$deltaSeq%012d"))
      }
      CrashHooks.maybe("sparse.afterDeltaMove")
      touched.foreach { b =>
        swapDir(tfTmp.resolve(s"_bucket=$b"), base.resolve("tf").resolve(s"_bucket=$b"))
        CrashHooks.maybe("sparse.midTfSwap")
        swapDir(dlTmp.resolve(s"_bucket=$b"), base.resolve("doclen").resolve(s"_bucket=$b"))
      }
      VectorStoreCatalog.deleteRec(tfTmp); VectorStoreCatalog.deleteRec(dlTmp)
      if (foldNow) {
        swapDir(tdTmp, base.resolve("termdf"))
        pendingDeltas.foreach(VectorStoreCatalog.deleteRec)
      } else if (emptyDelta) VectorStoreCatalog.deleteRec(tdTmp)
      swapDir(gTmp, base.resolve("global"))
      refresh(spark, dir)
    }
    Pending(add, termDfM, globalM, commit)
  }

  private def writeTmp(df: DataFrame, base: Path, name: String,
      partitionCol: Option[String]): Path = {
    val tmp = base.resolve(s"${name}_tmp_" + System.nanoTime())
    val d = partitionCol.fold(df)(c => df.repartition(col(c)))
    val w = d.write.mode(SaveMode.Overwrite)
    partitionCol.fold(w)(c => w.partitionBy(c)).parquet(tmp.toString)
    tmp
  }

  private def swapDir(src: Path, target: Path): Unit =
    VectorStoreCatalog.swapDir(src, target)

  private def refresh(spark: SparkSession, dir: String): Unit =
    Seq("tf", "doclen", "termdf", "global").foreach(t =>
      spark.catalog.refreshByPath(s"$dir/$t"))
}
