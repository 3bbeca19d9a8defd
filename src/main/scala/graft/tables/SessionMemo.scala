package graft.tables

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession

/** Session-scoped memo map: one `TrieMap[K, V]` per SparkSession, the
  * sessions held WEAKLY.
  *
  * Why: the engine memoizes derived stages (cached pipeline frames,
  * seeded table dirs, registered names) once per (session, input). The
  * original spelling — a process-global
  * `TrieMap[(SparkSession, K), V]` — strong-references every session
  * ever seen for process lifetime (r15 ADVICE, fixed for SimQueries in
  * r16 via SessionStampMemo; this class closes the remaining modules).
  * Keying a WeakHashMap by session lets a closed session's entries
  * collect with it.
  *
  * Weak-key caveat, inherited from SessionStampMemo and documented
  * once here: WeakHashMap holds values strongly, so an inner map whose
  * VALUES reference the session (a cached DataFrame) keeps the key
  * strongly reachable and the entry pinned — for those memos this
  * class is leak-NEUTRAL (no worse than the TrieMap it replaces) and
  * the win is uniformity; for session-independent values (dir strings,
  * names — most of the storage seeds) the leak is actually closed.
  *
  * Concurrency contract is the TrieMap's own, unchanged from the
  * original spelling: `of(s)` hands back the per-session map and
  * `getOrElseUpdate` may evaluate its thunk more than once under a
  * same-key race (every converted call site already lived with that).
  */
final class SessionMemo[K, V] {

  private val bySession = new java.util.WeakHashMap[SparkSession, TrieMap[K, V]]()

  /** The per-session map — all TrieMap ops available on it. */
  def of(s: SparkSession): TrieMap[K, V] = synchronized {
    var m = bySession.get(s)
    if (m == null) { m = TrieMap.empty[K, V]; bySession.put(s, m) }
    m
  }

  def getOrElseUpdate(s: SparkSession, k: K)(compute: => V): V =
    of(s).getOrElseUpdate(k, compute)
}
