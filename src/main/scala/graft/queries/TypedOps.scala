package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import Sqlh._

/** Typed `Dataset[T]` surface (SURVEY §1.2): case-class Encoders where
  * compile-time safety helps — the reagent-math style computations of the
  * reference carry domain meaning per field, which `Dataset[Lineitem]`
  * preserves through the lambda API. The aggregation itself drops back to
  * the untyped decimal-sum form so the §7.3 parity rules still hold (typed
  * `Aggregator` doubles would re-introduce summation-order nondeterminism).
  */
object TypedOps {

  case class LineItem(l_orderkey: Long, l_quantity: Double,
      l_extendedprice: Double, l_discount: Double, l_returnflag: String)

  case class Ev(user_id: Long, event_id: Long, ts_us: Long)

  val all: Seq[Q] = Seq(


    // Sessionization through the TYPED secondary-sort API
    // (KeyValueGroupedDataset.flatMapSortedGroups): per-user iterators
    // arrive (ts_us, event_id)-sorted INSIDE the group shuffle — the
    // engine-managed form of "mapPartitions but ordered", with none of
    // the manual partition bookkeeping. The per-user fold carries only a
    // counter + previous timestamp (O(1) state, any group size); output
    // is bit-identical to the window-based `sessionize`, so it shares
    // that oracle verbatim.
    Q("sessionize_typed",
      s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
         |m AS (SELECT user_id, event_id, ts_us,
         |    lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_ts
         |  FROM e)
         |SELECT event_id, user_id,
         |  CAST(sum(CASE WHEN prev_ts IS NULL OR ts_us - prev_ts > 1800000000 THEN 1 ELSE 0 END)
         |    OVER (PARTITION BY user_id ORDER BY ts_us, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_seq
         |FROM m ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.events(s, d).select("user_id", "event_id", "ts_us").as[Ev]
        .groupByKey(_.user_id)
        .flatMapSortedGroups(col("ts_us"), col("event_id")) { (uid, it) =>
          var seq = 0L
          var prev = Long.MinValue
          it.map { e =>
            if (prev == Long.MinValue || e.ts_us - prev > 1800000000L) seq += 1
            prev = e.ts_us
            (e.event_id, uid, seq)
          }
        }
        .toDF("event_id", "user_id", "sess_seq")
        .orderBy("user_id", "event_id")
    },

    // typed filter + map feeding the standard decimal aggregation
    Q("typed_filter_agg",
      s"""SELECT l_returnflag, count(*) AS n_big,
         |  ${dsum("l_extendedprice * (1 - l_discount)")} AS rev_big
         |FROM lineitem WHERE l_quantity > 40
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_quantity", "l_extendedprice", "l_discount", "l_returnflag")
        .as[LineItem]
        .filter((li: LineItem) => li.l_quantity > 40) // typed predicate
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_big"),
          expr(dsumSpark("l_extendedprice * (1 - l_discount)")).as("rev_big"))
        .orderBy("l_returnflag")
    },
  )
}
