package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Tracks the MEMORY_AND_DISK persists created while composing a query so
  * the composite operator can unpersist them once its result is
  * materialized. Without this, long sessions composing several near-dup
  * queries accumulate cached intermediate frames until storage eviction
  * kicks in (round-2 ADVICE): Catalyst shares nothing across join branches
  * except identical exchanges, so the intermediates MUST be persisted while
  * the query is being assembled — but they are garbage the moment the final
  * result is checkpointed.
  */
class PersistScope {
  private val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  def persist(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    frames.synchronized { frames += df }
    df
  }

  /** Unpersist every tracked frame (non-blocking). Call only after the
    * composite's result is materialized (checkpointed / written). */
  def release(): Unit = frames.synchronized {
    frames.foreach(_.unpersist(blocking = false))
    frames.clear()
  }
}

object PersistScope {
  /** Persist without tracking — for direct stage-level calls where the
    * caller owns the cache lifetime (the pre-scope behavior). */
  val unmanaged: PersistScope = new PersistScope {
    override def persist(df: DataFrame): DataFrame = {
      df.persist(StorageLevel.MEMORY_AND_DISK)
      df
    }
    override def release(): Unit = ()
  }

  /** Set (e.g. by graft.Explain) to keep composite operators LAZY so their
    * full Catalyst plan stays inspectable — the default eager checkpoint
    * replaces it with a Scan ExistingRDD. Lazy mode also skips the release
    * (the un-materialized plan still references the caches). */
  val LazyProp = "graft.scope.lazy"

  /** Run `body` with a fresh scope; materialize its result with an EAGER
    * localCheckpoint, then release every intermediate persist. The
    * checkpoint truncates lineage too, so the returned frame no longer
    * references the released caches. */
  def scoped(body: PersistScope => DataFrame): DataFrame =
    if (java.lang.Boolean.getBoolean(LazyProp)) body(unmanaged)
    else {
      val scope = new PersistScope
      try body(scope).localCheckpoint(true)
      finally scope.release()
    }
}
