package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable.ArrayBuffer

/** Cache hygiene for the gated query layer (r15, round-14 verdict
  * directive 2).
  *
  * Many queries persist an intermediate frame that feeds several
  * branches of their own plan (a signature table read by three joins, a
  * pair aggregate read by both direction legs). Before r15, most of
  * those persists had no matching unpersist: the bench/verify harnesses
  * mask it with `clearCache()` between queries, but in library/service
  * use every call grew the block manager until eviction pressure — and
  * compositions doubled it (r14's p26w cached the d10w pair frame
  * twice). A handful of queries hand-rolled the fix (d9w's "pin the
  * output, release the intermediates"); this object makes that
  * discipline structural so the next query can't forget it:
  *
  *  - intermediates are registered with [[hold]] (or the `.held()`
  *    postfix) instead of bare `.persist()`;
  *  - every GATED entry point runs under [[scoped]] (the family
  *    registries wrap their maps via [[scopedAll]]), which — iff any
  *    hold happened — pins the output (persist + count, so held
  *    branches materialize it from cache exactly once), then releases
  *    every held intermediate.
  *
  * After a scoped query returns, the only new cached entry is the
  * returned output itself; the caller releases it with one
  * `result.unpersist()` (which `CacheHygieneSpec` proves restores the
  * session's cached-RDD census to baseline for all gated queries).
  * Scopes nest: a gated query composing another gated query hands the
  * inner pin to the outer scope, so the outermost caller still holds
  * exactly one cache entry. Outside any scope, [[hold]] degrades to a
  * plain `persist()` — private builders keep their old behavior when
  * specs drive them directly.
  *
  * At lake scale this is the executor-memory half of the [[graft
  * .RunAssets]] lifecycle rule: run-scoped parquet has a TTL on disk,
  * and query-scoped cache has a release point in code.
  */
object QueryScope {

  private val stack = new ThreadLocal[List[ArrayBuffer[DataFrame]]] {
    override def initialValue(): List[ArrayBuffer[DataFrame]] = Nil
  }

  /** Persist `df` and register it for release when the enclosing
    * [[scoped]] block ends (plain persist when no scope is active).
    */
  def hold(df: DataFrame): DataFrame = {
    df.persist()
    stack.get() match {
      case h :: _ => h += df
      case Nil    => ()
    }
    df
  }

  /** Postfix form: `frame.held()` reads like `.persist()` at call
    * sites.
    */
  implicit final class HoldOps(private val df: DataFrame) extends AnyVal {
    def held(): DataFrame = hold(df)
  }

  /** Run one gated-query build in a fresh scope. If the build (or
    * anything it called) held intermediates, pin the output — persist +
    * eager count, so every held branch materializes it exactly once
    * from cache — then release the held frames. The pin itself is
    * handed to the parent scope when one exists (composed gated
    * queries), otherwise it is the single cache entry the caller
    * releases via `result.unpersist()`. A build with no holds passes
    * through untouched (still lazy, nothing cached).
    */
  def scoped(body: => DataFrame): DataFrame = {
    val held = new ArrayBuffer[DataFrame]()
    stack.set(held :: stack.get())
    try {
      val out = body
      if (held.nonEmpty) {
        out.persist()
        out.count()
        held.filterNot(_ eq out).foreach(_.unpersist())
        held.clear()
        // composed gated queries: the outer scope releases this pin
        stack.get().tail.headOption.foreach(_ += out)
      }
      out
    } finally {
      stack.set(stack.get().tail)
      // exception path (held was cleared on success): drop what we held
      held.foreach(_.unpersist())
    }
  }

  /** Wrap a family's query registry so every gated entry runs
    * [[scoped]]. The raw map stays available for plan-inspection specs
    * that must see the lazy, uncached plan.
    */
  def scopedAll(
      raw: Map[String, (SparkSession, String) => DataFrame])
      : Map[String, (SparkSession, String) => DataFrame] =
    raw.map { case (k, f) =>
      k -> ((s: SparkSession, d: String) => scoped(f(s, d)))
    }
}
