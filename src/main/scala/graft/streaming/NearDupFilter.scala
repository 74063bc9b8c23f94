package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online (ingest-time) near-duplicate candidate detection — the streaming
  * half of the banded-minhash dedup family, sharing the batch kernel
  * ([[graft.queries.TextSim.gramTable]] / `bandSignatures`): per
  * band-bucket keyed state holds the owning (lowest) doc_id, and every
  * later arrival into an owned bucket is flagged a duplicate CANDIDATE
  * (the exact-Jaccard re-rank happens downstream, exactly as in the batch
  * pipeline — banding bounds the candidate set, it never decides alone).
  *
  * Two entry points:
  *  - [[candidates]] — cold start: state begins empty, the stream dedups
  *    against itself (within and across micro-batches).
  *  - [[candidatesWarmStarted]] — the cross-run warehouse shape (the
  *    streaming twin of the `dedup_incremental` batch key): state is
  *    SEEDED from a previously persisted signature index
  *    ([[indexFromBatch]] over stored `bandSignatures` rows), so a new
  *    run's stream is deduped against every prior run from its very
  *    first micro-batch, without replaying old corpora through the
  *    stream.
  *
  * Scale shape: state is one long per OCCUPIED band bucket — bounded by
  * the corpus's distinct (band, minhash-pair) values, spillable on the
  * RocksDB state backend (StreamingSpec pins the provider), and keyed
  * exactly like the batch band equi-join so a bucket's traffic lands on
  * one state partition. Rows are (doc_id, bi, bv1, bv2) — 8-byte
  * integers end to end, the r12 cross-engine sketch discipline.
  */
object NearDupFilter {

  /** The per-bucket transition: state = lowest doc_id seen (the bucket
    * owner). Arrivals above the owner are flagged; an arrival BELOW the
    * current owner takes ownership and flags the previous owner (run
    * determinism: within a micro-batch, ids are processed in sorted
    * order because shuffle arrival order is not stable).
    */
  private[graft] val flag: ((Int, Long, Long), Iterator[(Long, Int, Long, Long)],
      GroupState[Long]) => Iterator[(Long, Int)] =
    (bucket, rows, state) => {
      val ids = rows.map(_._1).toSeq.sorted
      var owner = state.getOption
      val out = scala.collection.mutable.ListBuffer[(Long, Int)]()
      ids.foreach { id =>
        owner match {
          case Some(o) if o < id => out += ((id, bucket._1))
          case Some(o) if o > id => out += ((o, bucket._1)); owner = Some(id)
          case None => owner = Some(id)
          case _ => () // re-delivery of the owner itself: no-op
        }
      }
      owner.foreach(state.update)
      out.iterator
    }

  /** Cold-start candidate stream over band-signature rows
    * (doc_id, bi, bv1, bv2): emits (doc_id, bi) per flagged candidate,
    * in Update mode. Works identically on a batch Dataset (Spark's
    * unified semantics), which is how the spec's batch twin is derived.
    */
  def candidates(bands: Dataset[(Long, Int, Long, Long)]): Dataset[(Long, Int)] = {
    import bands.sparkSession.implicits._
    bands.groupByKey(r => (r._2, r._3, r._4))
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(flag)
  }

  /** Warm-started candidate stream: bucket state begins at the persisted
    * index's owners, so arrivals collide with PRIOR RUNS immediately.
    * The index is distilled to ONE owner per bucket here (min doc_id,
    * the ownership rule everywhere in this family) — Spark rejects
    * multi-row initial state per key AT RUNTIME, so a caller passing raw
    * per-doc signature rows instead of [[indexFromBatch]]'s aggregated
    * output must not blow up the stream's first micro-batch.
    */
  def candidatesWarmStarted(bands: Dataset[(Long, Int, Long, Long)],
      index: Dataset[((Int, Long, Long), Long)]): Dataset[(Long, Int)] = {
    import bands.sparkSession.implicits._
    val initial = index.groupByKey(_._1).mapValues(_._2).reduceGroups(math.min _)
      .groupByKey(_._1).mapValues(_._2)
    bands.groupByKey(r => (r._2, r._3, r._4))
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout(),
        initialState = initial)(flag)
  }

  /** Distill a stored signature table (`bandSignatures` output: doc_id,
    * n, bi, bv1, bv2 — or any frame with those four columns) into the
    * per-bucket owner index [[candidatesWarmStarted]] seeds from. In
    * production this is ONE aggregation over the persisted index table,
    * run once per stream start; min(doc_id) matches the batch twin's
    * ownership rule so warm-started streams and batch re-runs agree.
    */
  def indexFromBatch(bands: DataFrame): Dataset[((Int, Long, Long), Long)] = {
    import bands.sparkSession.implicits._
    bands.groupBy("bi", "bv1", "bv2").agg(min("doc_id").as("owner"))
      .select(struct(col("bi"), col("bv1"), col("bv2")).as("bucket"), col("owner"))
      .as[((Int, Long, Long), Long)]
  }
}
