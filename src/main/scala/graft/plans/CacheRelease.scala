package graft.plans

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.util.QueryExecutionListener

/** Release-after-first-materialization for operators that persist an
  * intermediate, pull a bounded summary of it, and hand the caller a
  * LAZY plan sharing the cache (IvfIndex.searchBulk's probe
  * assignment, the NB df-tier's tokenized corpus): without a hook the
  * cached blocks stay pinned until the ContextCleaner happens to GC
  * the plan — a storage/disk leak in long-lived sessions.
  *
  * Mechanics (r14 directive 5, hardened per r15 directive 7 + ADVICE):
  *
  *   - The returned plan is TAGGED with a per-call constant-true
  *     filter over a unique literal (`lit(id) === lit(id)`): analysis
  *     keeps it (so sameResult matching sees it), the optimizer
  *     constant-folds it away (so execution cost is nil), and two
  *     otherwise IDENTICAL calls can never match each other's target —
  *     the r15 spelling matched via sameResult on untagged plans, so
  *     the first materialization of twin calls fired BOTH listeners
  *     and unpersisted the twin's still-pending cache (r15 ADVICE).
  *   - The QueryExecutionListener matches the RETURNED (tagged) plan's
  *     analyzed subtree, never the internal pull's: the pull's own
  *     SQLExecutionEnd event is posted to the async listener bus before
  *     registration but may be DELIVERED after it, and matching a plan
  *     it contains would release before the caller ever ran (r15
  *     review). The pull's plan can never contain the tag.
  *   - Pending releases are CAPPED per session ([[MaxPending]]): a
  *     caller that never materializes (or consumes via RDD actions the
  *     SQL listener bus never sees) previously leaked its cache AND a
  *     listener running a tree-walk on every later query for session
  *     lifetime. Past the cap, the OLDEST pending entry force-releases
  *     — its caller, if it ever does materialize, recomputes uncached
  *     (correct, just slower).
  *   - All pending releases fire on SparkListenerApplicationEnd, and
  *     [[releaseAll]] is the explicit handle for tests/operational
  *     drains. Sessions key a WeakHashMap, so the registry itself
  *     never pins a session.
  */
object CacheRelease {

  /** Most pending (registered, not yet materialized) releases per
    * session before the oldest is force-released. 32 in-flight
    * never-materialized bulk plans is far past any sane interactive
    * backlog; the cap exists so an abandoning caller bounds the leak
    * at "recompute later" instead of "cached blocks + a tree-walking
    * listener forever". */
  val MaxPending = 32

  private val nextId = new java.util.concurrent.atomic.AtomicLong()

  private final case class Pending(
      id: Long, listener: QueryExecutionListener, release: () => Unit)

  // Weak session keys: a session whose pendings all fired leaves an
  // EMPTY inner map (no path back to the key), so the entry collects
  // with the session. While pendings exist, their release closures
  // necessarily reference session-owned objects (the cached DataFrame)
  // and pin the entry — bounded at MaxPending and cleared at
  // application end, which is the strongest no-leak contract available
  // without dropping the release itself.
  private val pendingBySession =
    new java.util.WeakHashMap[SparkSession, java.util.LinkedHashMap[java.lang.Long, Pending]]()

  private val appEndHooked =
    new java.util.WeakHashMap[org.apache.spark.SparkContext, java.lang.Boolean]()

  /** Register `release` to run after the first completed execution
    * (success OR failure) of the returned plan, and return that plan —
    * `out` tagged uniquely. Callers must hand the RETURNED frame to
    * their caller; executing the untagged `out` does not fire. */
  def afterFirstMaterialization(
      spark: SparkSession, out: DataFrame, release: () => Unit): DataFrame = {
    val id = nextId.incrementAndGet()
    val tagged = out.filter(lit(id) === lit(id))
    val target = tagged.queryExecution.analyzed
    val listener = new QueryExecutionListener {
      private def maybe(qe: org.apache.spark.sql.execution.QueryExecution): Unit =
        if (qe.analyzed.exists(_.sameResult(target))) fire(spark, id)
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = maybe(qe)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = maybe(qe)
    }
    val overflow: Option[Pending] = synchronized {
      val m = {
        var mm = pendingBySession.get(spark)
        if (mm == null) {
          mm = new java.util.LinkedHashMap[java.lang.Long, Pending]()
          pendingBySession.put(spark, mm)
        }
        mm
      }
      m.put(id, Pending(id, listener, release))
      if (appEndHooked.get(spark.sparkContext) == null) {
        appEndHooked.put(spark.sparkContext, java.lang.Boolean.TRUE)
        spark.sparkContext.addSparkListener(new SparkListener {
          override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit =
            releaseEverything()
        })
      }
      if (m.size > MaxPending) {
        val oldest = m.values.iterator.next()
        m.remove(Long.box(oldest.id))
        Some(oldest)
      } else None
    }
    spark.listenerManager.register(listener)
    // Registration happens OUTSIDE the lock (the manager has its own
    // synchronization), so a concurrent releaseAll/app-end drain may
    // have already removed this id — its unregister of the
    // not-yet-registered listener was a no-op, and without this
    // re-check the listener would stay registered for session
    // lifetime, tree-walking every later query (r16 review).
    val stillPending = synchronized {
      Option(pendingBySession.get(spark)).exists(_.containsKey(Long.box(id)))
    }
    if (!stillPending) spark.listenerManager.unregister(listener)
    // Force-release OUTSIDE the lock (release may run Spark calls).
    overflow.foreach(p => runRelease(spark, p))
    tagged
  }

  /** Unregister + release, never letting one entry's failure (an
    * unpersist on a stopping context, a DROP whose require fails)
    * abort a multi-entry drain whose map entries are already removed —
    * that would leak the rest permanently (r16 review). */
  private def runRelease(spark: SparkSession, p: Pending): Unit = {
    import scala.util.control.NonFatal
    try spark.listenerManager.unregister(p.listener)
    catch {
      case _: InterruptedException => Thread.currentThread().interrupt()
      case NonFatal(_) => ()
    }
    try p.release()
    catch {
      // NonFatal only: an OOM/VM error must propagate, and an
      // interrupt must keep its flag so a cancelling drain thread
      // still sees the signal (r16 review).
      case _: InterruptedException => Thread.currentThread().interrupt()
      case NonFatal(t) =>
        System.err.println(s"CacheRelease: release ${p.id} failed: $t")
    }
  }

  /** Remove-then-run: the pending-map removal is the idempotence gate
    * (the listener's success/failure callbacks and a cap-forced release
    * can race — only whoever removes the entry runs the release). */
  private def fire(spark: SparkSession, id: Long): Unit = {
    val p = synchronized {
      Option(pendingBySession.get(spark)).flatMap(m => Option(m.remove(Long.box(id))))
    }
    p.foreach(pend => runRelease(spark, pend))
  }

  /** Fire every pending release for `spark` — the explicit drain for a
    * caller that abandoned plans without materializing. */
  def releaseAll(spark: SparkSession): Unit = {
    val ps = synchronized {
      val m = pendingBySession.get(spark)
      if (m == null) Seq.empty[Pending]
      else {
        val all = scala.jdk.CollectionConverters.CollectionHasAsScala(m.values).asScala.toSeq
        m.clear()
        all
      }
    }
    ps.foreach(p => runRelease(spark, p))
  }

  private def releaseEverything(): Unit = {
    val sessions = synchronized {
      scala.jdk.CollectionConverters.SetHasAsScala(pendingBySession.keySet())
        .asScala.toSeq
    }
    sessions.foreach(releaseAll)
  }

  /** Test hook: pending release count for a session. */
  private[graft] def pendingCountForTest(spark: SparkSession): Int = synchronized {
    Option(pendingBySession.get(spark)).map(_.size).getOrElse(0)
  }
}
