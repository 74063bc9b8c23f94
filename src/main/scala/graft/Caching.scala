package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Cache-ownership contract for the dedup/graph operator family.
  *
  * Several operators (`LlmOps.jaccardPairs`, `TextSim.minhashNearDupPairs`,
  * `ConnectedComponents.minLabel` / `alternatingStars`) persist DataFrames:
  *
  *   - INTERMEDIATES the returned frame no longer needs (jaccardPairs'
  *     gram table, CC's per-round label frames) are owned by the operator —
  *     it materializes them in one job (so concurrent consumer stages never
  *     race to populate the cache) and unpersists them before returning.
  *     Callers never see these.
  *   - Everything the RETURNED result still depends on is the CALLER's to
  *     retire. That is the returned frame itself where the operator
  *     materialized it (jaccardPairs' pair graph, minLabel's labels), and
  *     ALSO any cache the returned frame still reads lazily:
  *     `minhashNearDupPairs` returns an UNEXECUTED plan over its cached
  *     gram table, so that cache must outlive the caller's consumption of
  *     the result. Unpersist per-frame when done, or call
  *     `spark.catalog.clearCache()` between queries the way `Verify`/
  *     `Bench` do — nothing uses RDD-level persistence or checkpoints, so
  *     one `clearCache()` always cleans the whole session (asserted in
  *     ScaleSpec "dedup family leaves nothing behind").
  *
  * Composed queries re-enter these operators with identical plans (e.g.
  * `dedup_cluster` after `graph_degree` both build the same pair graph in
  * one session). `ensureCached` makes the operator-side persists idempotent
  * against Spark's plan-keyed SQL cache: re-persisting an already-cached
  * plan is a CacheManager warning and, worse, masks genuine double-cache
  * bugs — looking the plan up first keeps the reuse AND the silence.
  */
object Caching {

  /** The shared cold-branch materialization the pair-graph kernels use:
    * if `result` is not already plan-cached (warm re-entry), pin
    * `intermediate` in ONE job (so the downstream self-join's map stages
    * never race to populate it), materialize `result`, then retire the
    * intermediate. A warm call touches NOTHING — re-pinning the
    * intermediate would re-run its whole pipeline and leak the persist
    * (the dedup_containment regression ScaleSpec pins).
    */
  def materializeRetiring(result: DataFrame, intermediate: DataFrame): DataFrame = {
    if (result.storageLevel == StorageLevel.NONE) {
      ensureCached(intermediate)
      intermediate.count()
      result.persist()
      result.count()
      intermediate.unpersist(blocking = false)
    }
    result
  }

  /** Persist `df` unless its plan is already in the session's SQL cache
    * (plan-keyed lookup via `Dataset.storageLevel`), then return it.
    */
  def ensureCached(df: DataFrame): DataFrame =
    if (df.storageLevel == StorageLevel.NONE) df.persist() else df
}

/** Session-keyed memo for deterministic driver-side model state (trained
  * codebooks, quantizer centroids, the frames that carry them): one
  * computation per (session, key), so composed queries in one session
  * never re-train identical models — and, for plans bearing UDF
  * closures, actually SHARE the plan (ScalaUDF plan equality is closure
  * identity, so only the literal same DataFrame object can hit the SQL
  * cache).
  *
  * Eviction, two-layer: entries whose session's SparkContext has stopped
  * are dropped on the next access, and when the map outgrows
  * [[SessionMemo.MaxEntries]] every OTHER session's entries are dropped
  * too — so a service cycling `newSession()` handles over one long-lived
  * context (where `isStopped` never fires) stays bounded: an evicted
  * session merely re-trains on its next call.
  *
  * The computation runs OUTSIDE the map (get → compute → putIfAbsent),
  * never inside `computeIfAbsent`: training is seconds of Spark jobs,
  * and holding a CHM bin that long would block unrelated sessions'
  * lookups. The race cost is benign by construction — training is
  * deterministic, so a losing duplicate computes the identical value
  * (its transient caches clean up with the session's next clearCache).
  */
final class SessionMemo[K, V] {
  private val m = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, K), V]()
  def getOrElseUpdate(s: org.apache.spark.sql.SparkSession, k: K)(f: (org.apache.spark.sql.SparkSession, K) => V): V = {
    m.keySet.removeIf(e => e._1.sparkContext.isStopped)
    val key = (s, k)
    val existing = m.get(key)
    if (existing != null) existing
    else {
      val computed = f(s, k)
      if (m.size >= SessionMemo.MaxEntries)
        m.keySet.removeIf(e => e._1 ne s)
      val prev = m.putIfAbsent(key, computed)
      if (prev != null) prev else computed
    }
  }
}

object SessionMemo {
  /** Generous for the engine's deployment shapes (a handful of model
    * keys × dataset dirs per session) while bounding session-cycling
    * services; crossing it evicts other sessions' entries. */
  final val MaxEntries = 64
}
