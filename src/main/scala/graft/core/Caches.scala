package graft.core

import org.apache.spark.sql.DataFrame

/** Registry of persisted DataFrames that back lazily returned results
  * (dedup band tables, graph rank vectors). Spark has no "unpersist
  * when the consuming action finishes" hook, so producers register
  * handles here and the harness (Verify/Bench/JudgeProbe) drains them
  * after each query's action completes. Untracked, these persists
  * would pin executor storage for the session lifetime.
  *
  * Two tiers:
  *  - the GLOBAL queue ([[track]] outside any scope, drained by
  *    [[release]]) keeps the strictly sequential
  *    build→action→release contract the harness uses;
  *  - [[scope]] gives a concurrent harness a PRIVATE registry: every
  *    frame tracked during the body (operators call [[track]]
  *    statically, so redirection is thread-local to the constructing
  *    thread) lands in the returned [[Scope]], and closing that scope
  *    releases exactly those handles — interleaved queries can no
  *    longer release each other's caches. Close AFTER the consuming
  *    action (the frames are lazy); [[Scope]] is an `AutoCloseable`,
  *    and closing from a different thread than the one that built the
  *    queries is safe.
  */
object Caches {

  /** Handles tracked inside a [[Caches.scope]] body; [[close]] releases
    * exactly these (idempotent). */
  final class Scope private[Caches] () extends AutoCloseable {
    private[Caches] val handles =
      new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
    def close(): Unit = drain(handles)
  }

  private val global =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
  private val active = new ThreadLocal[Scope]()

  private def drain(
      q: java.util.concurrent.ConcurrentLinkedQueue[DataFrame]): Unit = {
    var df = q.poll()
    while (df != null) { df.unpersist(blocking = false); df = q.poll() }
  }

  /** Persist `df` and register the handle — with the enclosing
    * [[scope]] when one is active on this thread, else globally for the
    * next [[release]]. */
  def track(df: DataFrame): DataFrame = {
    val p = df.persist()
    val s = active.get()
    (if (s != null) s.handles else global).add(p)
    p
  }

  /** Unpersist every GLOBALLY registered handle since the last release.
    * Scoped handles are untouched — their [[Scope]] owns them. */
  def release(): Unit = drain(global)

  /** Run `body` with a private registry and return (result, scope).
    * Close the scope after the consuming action; nesting restores the
    * outer scope on exit. If `body` THROWS, the scope is closed before
    * the exception propagates — the caller never sees the Scope, so
    * anything tracked up to the failure would otherwise be orphaned
    * pinned storage (and it never falls through to the global queue,
    * where a concurrent harness's [[release]] could unpersist it
    * mid-query). */
  def scope[T](body: => T): (T, Scope) = {
    val s = new Scope
    val prev = active.get()
    active.set(s)
    try (body, s)
    catch { case t: Throwable => s.close(); throw t }
    finally active.set(prev)
  }

  /** Run `body` with tracking redirected to an EXISTING scope. Scope
    * redirection is thread-local to the constructing thread, so a
    * harness that fans ONE query's construction across worker threads
    * (or builds artifacts under another thread's memo) wraps each
    * worker's construction in `rebind(s) {...}` — otherwise those
    * workers' [[track]] calls land in the GLOBAL queue, where a
    * concurrent harness's [[release]] can unpersist them mid-query.
    * Exceptions propagate unchanged; the scope stays open (its owner
    * closes it). */
  def rebind[T](s: Scope)(body: => T): T = {
    val prev = active.get()
    active.set(s)
    try body
    finally active.set(prev)
  }

  /** The scope active on THIS thread, if any — capture it inside a
    * [[scope]] body to hand to worker threads via [[rebind]]. */
  def current: Option[Scope] = Option(active.get())
}
