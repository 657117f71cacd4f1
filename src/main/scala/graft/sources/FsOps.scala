package graft.sources

import java.nio.file.{Files, Path, StandardCopyOption}

/** Commit-phase filesystem operations behind one seam, so the catalog's
  * commit protocols run unchanged on two storage models:
  *
  *  - [[AtomicFs]] (default): POSIX semantics — directory rename is atomic.
  *    Every swap is two renames, as before.
  *  - object-store semantics (S3/GCS class): there is NO directory rename.
  *    "Move" is per-object copy-then-delete, non-atomic as a sequence; the
  *    only atomic primitive is a single-object PUT (readers see the old or
  *    the new object in full, never a torn one). [[ObjectStoreSimFs]]
  *    simulates exactly that locally, with a crash-injection budget, so
  *    ObjectStoreCommitSpec can kill the protocol between EVERY pair of
  *    object operations and assert consistent reads + replay convergence.
  *
  * The protocol that makes copy-then-delete safe is the PUBLISH MARKER: a
  * directory is live only once its `_pub` object exists. [[copyTree]]
  * writes data objects first and markers last; [[deleteTree]] removes the
  * marker first and data after. A crash therefore always leaves a torn
  * directory UNPUBLISHED, and the heal-time aside sweep
  * ([[VectorStoreCatalog.healAsides]]) can distinguish a complete
  * generation from a partial one by one existence check — the same
  * write-new-then-swap-one-small-pointer idea as Iceberg's manifest commit,
  * carried at directory granularity. (On a real cluster this entire layer
  * is a table format's snapshot commit; this is the local/object-store
  * floor beneath it. `_pub`/`_aside_*` names are `_`-prefixed, so Spark's
  * file listing never reads them as data.)
  */
private[graft] abstract class FsOps {

  /** True when the underlying store renames directories atomically. */
  def atomicMoves: Boolean

  /** Crash-injection seam: called immediately BEFORE every mutating
    * object-level operation. Production implementations are a no-op.
    */
  protected def beforeOp(desc: String): Unit = ()

  /** Atomic single-object write (the S3 PUT analogue): tmp + atomic file
    * rename locally — readers see the old or the new object, never a torn
    * one. Publishing is the LAST act on a directory, so `_pub` present
    * implies every data object landed.
    */
  final def publish(dir: Path): Unit = {
    beforeOp(s"publish $dir")
    val tmp = dir.resolve("._pubtmp" + System.nanoTime())
    Files.write(tmp, Array.emptyByteArray)
    Files.move(tmp, dir.resolve(FsOps.Pub), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  final def isPublished(dir: Path): Boolean = Files.exists(dir.resolve(FsOps.Pub))

  /** Per-object copy of a tree, data objects first (sorted, for a
    * deterministic crash schedule), `_pub` markers LAST per directory
    * level. Each object copy is itself atomic (tmp + rename — the PUT
    * model); crashes land BETWEEN objects, leaving `dst` torn but
    * provably unpublished.
    */
  final def copyTree(src: Path, dst: Path): Unit = {
    if (Files.isDirectory(src)) {
      Files.createDirectories(dst)
      val kids = VectorStoreCatalog.listChildren(src).sortBy(_.getFileName.toString)
      val (markers, data) = kids.partition(_.getFileName.toString == FsOps.Pub)
      data.foreach(c => copyTree(c, dst.resolve(c.getFileName.toString)))
      if (markers.nonEmpty) publish(dst)
    } else {
      beforeOp(s"copy $src")
      val tmp = dst.resolveSibling(dst.getFileName.toString + "._cp" + System.nanoTime())
      Files.createDirectories(dst.getParent)
      Files.copy(src, tmp, StandardCopyOption.REPLACE_EXISTING)
      Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Per-object delete of a tree, `_pub` markers FIRST per directory level
    * (a partially deleted directory is never published), children before
    * parents.
    */
  final def deleteTree(p: Path): Unit = if (Files.exists(p)) {
    if (Files.isDirectory(p)) {
      val pub = p.resolve(FsOps.Pub)
      if (Files.exists(pub)) { beforeOp(s"delete $pub"); Files.deleteIfExists(pub) }
      VectorStoreCatalog.listChildren(p)
        .sortBy(_.getFileName.toString).foreach(deleteTree)
      beforeOp(s"rmdir $p")
      Files.deleteIfExists(p)
    } else {
      beforeOp(s"delete $p")
      Files.deleteIfExists(p)
    }
  }

  /** Move a fully written tree to its final name and publish it — the
    * append-commit primitive (delta commits, dictionary deltas). One
    * atomic rename + marker locally; copy-then-delete + marker on an
    * object store. In both models a crash before the final publish leaves
    * `fin` absent-or-unpublished, which readers skip and vacuum sweeps.
    */
  final def moveAndPublish(src: Path, fin: Path): Unit = {
    if (atomicMoves) {
      beforeOp(s"move $src -> $fin")
      Files.move(src, fin)
    } else {
      copyTree(src, fin)
      deleteTree(src)
    }
    publish(fin)
  }
}

private[graft] object FsOps {
  /** Publish-marker object name (`_`-prefixed: invisible to Spark reads). */
  val Pub = "_pub"
}

/** POSIX-rename production implementation. */
private[graft] object AtomicFs extends FsOps {
  override def atomicMoves: Boolean = true
}

/** Object-store simulation for ObjectStoreCommitSpec: no atomic directory
  * rename, and an op budget — the (budget+1)-th mutating object operation
  * throws [[CrashHooks.InjectedCrash]], observationally a process death at
  * that instant. `budget < 0` disables injection (pure copy-then-delete
  * semantics). [[ops]] counts total mutating operations, so the spec can
  * measure a clean run's op count and then crash at every window 0..N−1.
  */
private[graft] final class ObjectStoreSimFs(budget: Long = -1L) extends FsOps {
  override def atomicMoves: Boolean = false
  private val counter = new java.util.concurrent.atomic.AtomicLong(0L)
  def ops: Long = counter.get()
  override protected def beforeOp(desc: String): Unit = {
    val n = counter.getAndIncrement()
    if (budget >= 0 && n >= budget)
      throw new CrashHooks.InjectedCrash(s"objectstore op#$n: $desc")
  }
}
