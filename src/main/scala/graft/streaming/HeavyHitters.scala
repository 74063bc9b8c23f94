package graft.streaming

import org.apache.spark.sql.{Dataset, KeyValueGroupedDataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.MGSummary

/** Online heavy-hitters monitoring — the streaming twin of the
  * `freq_items` batch aggregate, sharing its [[MGSummary]] kernel and
  * wire format: per monitored group (an event type, a source, a tenant)
  * the keyed state is ONE serialized Misra–Gries summary (O(k) bytes),
  * folded forward every micro-batch and emitted in full, so a dashboard
  * reads the current top items after each batch and the MG contract
  * (`est ≤ true ≤ est + err`, every item above n/k present) holds over
  * the WHOLE stream history, not just the last window.
  *
  * Warm start mirrors [[NearDupFilter]]'s warehouse pattern: because a
  * summary is exactly (k, n, counters) and [[monitor]] emits every
  * counter plus n, a persisted emission round-trips into initial state
  * ([[stateFromRows]]) — a restarted monitor continues from a prior
  * run's sketch without replaying its corpus.
  *
  * Determinism: within a micro-batch each group's items fold in sorted
  * order (shuffle arrival order is not stable — the NearDupFilter rule),
  * so cold(batch1 ++ batch2) and warm-started(batch2 \| seeded batch1)
  * produce IDENTICAL counters, which the spec asserts bit-exactly. The
  * MG guarantees themselves hold under ANY fold order.
  *
  * Scale shape: state is O(k) per group regardless of stream volume,
  * spillable on the RocksDB backend; emission is O(k) rows per group per
  * batch. The fold is the only per-row work and it is local to the
  * group's state partition.
  */
object HeavyHitters {

  /** Emitted row: (group, item, est, err, n) — `err`/`n` are
    * summary-level (repeated per item row) so the emission captures the
    * FULL sketch state and can reseed a future run. */
  private[graft] def fold(k: Int): (String, Iterator[String], GroupState[Array[Byte]]) =>
      Iterator[(String, String, Long, Long, Long)] =
    (group, items, state) => {
      val s = state.getOption.map(MGSummary.fromBytes)
        .getOrElse(new MGSummary(k))
      items.toSeq.sorted.foreach(s.add)
      state.update(MGSummary.toBytes(s))
      val err = s.maxError
      s.counts.toSeq
        .sortBy { case (item, c) => (-c, item) }
        .map { case (item, c) => (group, item, c, err, s.n) }
        .iterator
    }

  /** Cold-start monitor over (group, item) rows: Update-mode emission of
    * each group's full current sketch per micro-batch. Works identically
    * on a batch Dataset (unified semantics), which is how the spec's
    * cold/warm equivalence twin is derived. */
  def monitor(items: Dataset[(String, String)], k: Int)
      : Dataset[(String, String, Long, Long, Long)] = {
    import items.sparkSession.implicits._
    items.groupByKey(_._1).mapValues(_._2)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(fold(k))
  }

  /** Warm-started monitor: state seeded from a prior run's persisted
    * emission (or any (group, item, est, n) rows shaped like it). */
  def monitorWarmStarted(items: Dataset[(String, String)], k: Int,
      initial: KeyValueGroupedDataset[String, Array[Byte]])
      : Dataset[(String, String, Long, Long, Long)] = {
    import items.sparkSession.implicits._
    items.groupByKey(_._1).mapValues(_._2)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout(),
        initialState = initial)(fold(k))
  }

  /** Rebuild per-group initial state from persisted monitor rows.
    * Counters can SHRINK across batches (MG decrements on misses), so
    * earlier emissions are stale, not subsets — and a max-over-batches
    * merge could exceed the final counter, silently breaking est ≤ true
    * and the error bound after warm start (r14 ADVICE). So only the
    * rows carrying each group's MAXIMUM n — exactly the group's latest
    * emission — are folded in; any stale rows from an accumulating sink
    * (e.g. a memory sink in Update mode, or an accidental union of
    * emissions) are dropped, never merged. Duplicate items WITHIN the
    * kept emission (which a correct sink never produces) still degrade
    * softly to the max est. Group row count is ≤ k−1 per emission, so
    * the per-group rebuild is O(rows), never O(data). */
  def stateFromRows(rows: Dataset[(String, String, Long, Long, Long)], k: Int)
      : KeyValueGroupedDataset[String, Array[Byte]] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_._1)
      .mapGroups { (g, rs0) =>
        val rs = rs0.toSeq
        val nMax = rs.iterator.map(_._5).max
        val s = new MGSummary(k)
        s.n = nMax
        rs.iterator.filter(_._5 == nMax).foreach { case (_, item, est, _, _) =>
          s.counts.update(item, math.max(s.counts.getOrElse(item, 0L), est))
        }
        (g, MGSummary.toBytes(s))
      }
      .groupByKey(_._1).mapValues(_._2)
  }
}
