package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import Sqlh._

/** SURVEY.md §2.11 — the batch-equivalent computations of each streaming
  * window over `events` (identical results by Spark's unified Dataset
  * semantics: the same `window`/`session_window` expressions run under
  * `readStream` unchanged — proven in StreamingSpec). Watermark/dedup/
  * stateful rows are stream-only and live in StreamingSpec.
  */
object StreamingBatch {

  val all: Seq[Q] = Seq(

    Q("stream_tumbling",
      s"""SELECT date_trunc('hour', ts) AS ws, event_type, count(*) AS cnt,
         |  ${dsum("value")} AS sum_v
         |FROM events GROUP BY ws, event_type ORDER BY ws, event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts_ntz"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), expr(dsumSpark("value")).as("sum_v"))
        .select(col("w.start").as("ws"), col("event_type"), col("cnt"), col("sum_v"))
        .orderBy("ws", "event_type")
    },

    Q("stream_sliding",
      s"""WITH assign AS (
         |  SELECT time_bucket(INTERVAL '30 minutes', ts) AS ws FROM events
         |  UNION ALL
         |  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' AS ws FROM events)
         |SELECT ws, count(*) AS cnt FROM assign GROUP BY ws ORDER BY ws""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts_ntz"), "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("w.start").as("ws"), col("cnt"))
        .orderBy("ws")
    },

    Q("stream_session",
      s"""WITH flagged AS (
         |  SELECT user_id, ts, event_id,
         |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) >= INTERVAL '30 minutes'
         |         THEN 1 ELSE 0 END AS brk
         |  FROM events),
         |sess AS (
         |  SELECT user_id, ts,
         |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM flagged)
         |SELECT user_id, min(ts) AS session_start, count(*) AS n_events
         |FROM sess GROUP BY user_id, sid
         |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(session_window(col("ts_ntz"), "30 minutes").as("sw"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("sw.start").as("session_start"), col("n_events"))
        .orderBy("user_id", "session_start")
    },
  )
}
