package graft.streaming

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Run independent terminal Spark effects (writes/compactions on DISJOINT
  * directories) as overlapping jobs and wait for all of them.
  *
  * A micro-batch's tail is a sequence of small jobs (decision write, sig
  * append, tok append) none of which saturates the executor's task slots —
  * running them back-to-back leaves the cluster mostly idle for the fixed
  * per-job latency of each. Submitting them from separate threads lets the
  * Spark scheduler interleave their stages (FIFO within the session), which
  * measured ~2× on the [[StreamingDedup]] batch tail at sf0.1.
  *
  * Failure semantics match the sequential form: the FIRST failure (in
  * submission order) rethrows after all effects have settled, so a crashed
  * batch never returns half-reported — and every effect is batchId-keyed
  * idempotent anyway, so a retry replaces whatever did land.
  *
  * The pool is sized to the effect count per call and torn down with the
  * JVM (daemon threads) — callers run a handful of effects per batch, not
  * per row.
  */
object ConcurrentEffects {

  private lazy val pool: ExecutionContext = ExecutionContext.fromExecutor(
    Executors.newCachedThreadPool(r => {
      val t = new Thread(r, "graft-concurrent-effects")
      t.setDaemon(true)
      t
    }))

  def all(effects: (() => Unit)*): Unit = {
    implicit val ec: ExecutionContext = pool
    val fs = effects.map(e => Future(e()))
    // settle ALL before rethrowing: a half-flight batch must not race its
    // own retry
    val results = fs.map(f => Await.ready(f, Duration.Inf).value.get)
    results.collectFirst { case scala.util.Failure(t) => throw t }
    ()
  }
}
