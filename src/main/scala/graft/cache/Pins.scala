package graft.cache

import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}
import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped registry of executor-storage pins left behind by the
  * unmanaged operator shorthands ([[graft.llm.Dedup.minHashPairs]],
  * [[graft.llm.Similarity.lshCosinePairs]], the [[graft.access.Split]]
  * one-shot forms). Each of those persists a shared intermediate
  * (signatures, LSH buckets, a split parent) that its `*Managed`
  * sibling would hand back as an [[AutoCloseable]]; the shorthand
  * drops the handle, which is fine for a one-shot job but accumulates
  * in a long-lived session: every pinned plan is ANOTHER entry Spark's
  * CacheManager canonicalize-compares each later query against, so
  * planning cost grows with every unreleased call — the q09–q13 drag
  * measured in BENCH_r06 after 64 llm queries had run.
  *
  * The shorthands therefore register their handle here, and a session
  * boundary (end of a pipeline run, between benchmark queries, a
  * long-running service's idle point) calls [[release]] to close them
  * all. Handles are closed in registration order; `close()` is
  * idempotent because `DataFrame.unpersist` on an already-released
  * plan is a no-op.
  *
  * Lifetime bound: the first [[track]] for a session installs an
  * application-end listener that drains that session's pins, so a
  * consumer who never calls [[release]] still gets every handle
  * closed (and the registry entry dropped) when the SparkContext
  * stops — the registry cannot outlive the session it pins. Between
  * those two points the map intentionally holds strong references:
  * a pinned plan IS live executor storage, and reclaiming it silently
  * (weak keys) would turn a measurable leak into an unmeasurable
  * perf cliff. Long-lived services should still call
  * [[release]] at idle points to return the storage early.
  */
object Pins {
  private val reg =
    new ConcurrentHashMap[SparkSession, ConcurrentLinkedQueue[AutoCloseable]]

  // sessions whose SparkContext already carries our end-of-app drain
  // hook (one listener per session, installed on first track)
  private val hooked = ConcurrentHashMap.newKeySet[SparkSession]

  /** Returns false when the context is already stopped (no listener
    * could be installed) — the caller must not leave handles in the
    * registry in that case, or they would linger undrained. */
  private def installHook(spark: SparkSession): Boolean =
    if (!hooked.add(spark)) true
    else {
      try { spark.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(
            end: SparkListenerApplicationEnd): Unit = {
          release(spark); hooked.remove(spark)
        }
      }); true }
      catch { case _: IllegalStateException =>   // context already stopped
        hooked.remove(spark); false
      }
    }

  /** Track `handle` for `spark` and return it (shorthands call
    * `Pins.track(df.sparkSession, handle).value`). Safe against a
    * concurrent [[release]]: if the queue we added to was removed
    * from the registry mid-add, either we take the handle back and
    * retry against the live queue, or the releaser already drained
    * (and closed) it — in which case the pin is simply gone and the
    * plan recomputes its parent per consumer, the documented
    * unpinned semantics. */
  def track[H <: AutoCloseable](spark: SparkSession, handle: H): H = {
    if (!installHook(spark)) {
      // context already stopped: executor storage is gone and no
      // end-of-app hook can ever drain a registry entry — don't
      // create one; close the handle now and hand it back (close is
      // an unpersist, a no-op against a stopped context)
      try handle.close() catch { case _: IllegalStateException => () }
      return handle
    }
    var retry = true
    while (retry) {
      val q = reg.computeIfAbsent(spark,
        _ => new ConcurrentLinkedQueue[AutoCloseable])
      q.add(handle)
      if (reg.get(spark) eq q) retry = false        // visibly registered
      else if (!q.remove(handle)) retry = false     // releaser closed it
      // else: orphaned queue, handle reclaimed — retry on the live one
    }
    handle
  }

  /** Close every tracked handle for `spark`; returns how many were
    * released. Safe to call at any point — plans already consumed just
    * lose their cached blocks; plans not yet executed recompute their
    * shared parent per consumer (the documented unpinned semantics). */
  def release(spark: SparkSession): Int = {
    val q = reg.remove(spark)
    if (q == null) 0
    else {
      var n = 0
      var h = q.poll()
      while (h != null) { h.close(); n += 1; h = q.poll() }
      n
    }
  }

  /** Track a localCheckpointed frame's checkpoint blocks and return
    * the frame. `localCheckpoint` persists the materialized RDD in
    * executor storage OUTSIDE the CacheManager — `DataFrame.unpersist`
    * cannot reach it, so without a handle the blocks linger until
    * ContextCleaner GC and repeated serves in one session accumulate
    * them. This extracts the LogicalRDD's backing RDD(s) and registers
    * an unpersist closure, so [[release]] reclaims checkpoint storage
    * like every other pin.
    *
    * CONSUME BEFORE RELEASE: a local checkpoint truncates lineage, so
    * unlike a cached plan the frame does NOT recompute after its pin
    * is released — a later action fails loudly with a missing
    * checkpoint block. That is the intended semantics for the slabbed
    * serves that use this (the scratch files the frame detached from
    * may have been overwritten by then; failing beats rereading them). */
  def trackLocalCheckpoint(df: DataFrame): DataFrame = {
    val rdds = df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }
    // an eagerly-localCheckpointed frame MUST analyze to a LogicalRDD;
    // finding none means a non-eager checkpoint or a Spark plan-shape
    // change, and silently registering a no-op closer would
    // reintroduce the storage leak this exists to close — be loud.
    if (rdds.isEmpty)
      System.err.println("[pins] WARNING: trackLocalCheckpoint found " +
        "no LogicalRDD in the analyzed plan — checkpoint blocks will " +
        "NOT be released (non-eager checkpoint or plan-shape change?)")
    track(df.sparkSession, new AutoCloseable {
      override def close(): Unit = rdds.foreach { r =>
        try r.unpersist(blocking = false)
        catch { case _: IllegalStateException => () }  // context stopped
      }
    })
    df
  }

  /** Number of currently-tracked handles (storage-footprint asserts). */
  def trackedCount(spark: SparkSession): Int = {
    val q = reg.get(spark)
    if (q == null) 0 else q.size
  }
}
