package graft.sources

/** Test-only fault injection for the commit protocols' RENAME phases.
  *
  * The jobs-then-renames discipline already guarantees that a failed Spark
  * JOB mutates nothing; the windows that remain are hard crashes BETWEEN
  * renames (process death mid-phase-2). Those cannot be produced by breaking
  * a job, so CrashRecoverySpec arms a named crash point and the protocol
  * throws exactly there — after some renames, before others — which is
  * observationally identical to `kill -9` at that instant (phase 2 performs
  * no further work after a throw).
  *
  * Production cost: one volatile read per armed-check, on driver-side rename
  * paths that run a handful of times per commit.
  */
private[graft] object CrashHooks {
  final class InjectedCrash(point: String)
    extends RuntimeException(s"injected crash at $point")

  @volatile private var armed: Set[String] = Set.empty

  /** Arm a crash at `point` (additive — concurrent sub-commits can each be
    * crashed in one scenario); the next [[maybe]] for it fires once.
    */
  def arm(point: String): Unit = synchronized { armed += point }
  def disarm(): Unit = synchronized { armed = Set.empty }

  def maybe(point: String): Unit =
    if (armed.contains(point)) synchronized {
      if (armed.contains(point)) { armed -= point; throw new InjectedCrash(point) }
    }
}

/** Test-only synchronization for the ASYNC index rebuilds: when a gate is
  * set, every background rebuild task parks on it before reading its data
  * snapshot, so a spec can deterministically run inserts "while the rebuild
  * is in flight" (backlog path) and prove the triggering insert returned
  * without waiting for the build. Production cost: one volatile read per
  * scheduled rebuild.
  */
private[graft] object RebuildHooks {
  @volatile var holdGate: Option[java.util.concurrent.CountDownLatch] = None

  /** Last scheduler pool name observed ON a rebuild thread — the spec's
    * window into [[VectorStoreCatalog.scheduleRebuild]]'s fair-pool
    * routing (a thread-local property is unreadable from the test thread).
    * One getLocalProperty per scheduled rebuild.
    */
  @volatile var observedPool: Option[String] = None

  def maybeHold(): Unit = {
    observedPool = org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .flatMap(s => Option(s.sparkContext.getLocalProperty("spark.scheduler.pool")))
    holdGate.foreach(_.await())
  }

  /** Park a rebuild BETWEEN phase 1 (staged build complete) and phase 2
    * (publish) — the window the drop/recreate epoch-guard spec needs to
    * hit deterministically. `publishArrived` signals the rebuild reached
    * the window; `publishGate` holds it there.
    */
  @volatile var publishArrived: Option[java.util.concurrent.CountDownLatch] = None
  @volatile var publishGate: Option[java.util.concurrent.CountDownLatch] = None
  def maybeHoldPublish(): Unit = {
    publishArrived.foreach(_.countDown())
    publishGate.foreach(_.await())
  }

  /** Park a detached pending-window FOLD between its absorb commit and the
    * pending-batch deletes — the straddle window the search-ordering spec
    * pins (a search issued here must serve every row from graph ∪ pending).
    */
  @volatile var foldCommitArrived: Option[java.util.concurrent.CountDownLatch] = None
  @volatile var foldCommitGate: Option[java.util.concurrent.CountDownLatch] = None
  def maybeHoldFoldCommit(): Unit = {
    foldCommitArrived.foreach(_.countDown())
    foldCommitGate.foreach(_.await())
  }
}
