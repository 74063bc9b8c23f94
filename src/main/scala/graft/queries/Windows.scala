package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** SURVEY.md §2.5 — window functions. Rank-family outputs are cast to INT on
  * the oracle side (DuckDB returns BIGINT, Spark INT). Every window ORDER BY
  * carries a unique tie-break except where tie semantics are the point
  * (rank/dense_rank get a ties-allowed window; row_number gets a total one).
  */
object Windows {

  val all: Seq[Q] = Seq(

    Q("window_rank",
      s"""SELECT c_custkey, c_nationkey, c_acctbal,
         |  CAST(rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS INT) AS rnk,
         |  CAST(dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS INT) AS drnk,
         |  CAST(row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rn
         |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val ties = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").desc)
      val total = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.customer(s, d).select(
        col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
        rank().over(ties).as("rnk"),
        dense_rank().over(ties).as("drnk"),
        row_number().over(total).as("rn"),
      ).orderBy("c_custkey")
    },

    Q("window_analytic",
      s"""SELECT event_id, user_id,
         |  lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS lag_v,
         |  lead(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS lead_v,
         |  first_value(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS first_ev
         |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      Tables.events(s, d).select(
        col("event_id"), col("user_id"),
        lag("value", 1).over(w).as("lag_v"),
        lead("value", 1).over(w).as("lead_v"),
        first("event_id").over(w).as("first_ev"),
      ).orderBy("event_id")
    },

    Q("window_nth",
      s"""SELECT c_custkey,
         |  nth_value(c_name, 2) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_c,
         |  last_value(c_name) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_c
         |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.customer(s, d).select(
        col("c_custkey"),
        nth_value(col("c_name"), 2).over(w).as("second_c"),
        last(col("c_name")).over(w).as("last_c"),
      ).orderBy("c_custkey")
    },

    Q("window_frame_rows",
      s"""SELECT o_orderkey, o_custkey,
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER (PARTITION BY o_custkey
         |    ORDER BY o_orderdate, o_orderkey
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
         |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"), col("o_custkey"),
        expr("""cast(sum(cast(o_totalprice as decimal(18,6))) over (partition by o_custkey
               |order by o_orderdate, o_orderkey
               |rows between unbounded preceding and current row) as double)""".stripMargin)
          .as("running"),
      ).orderBy("o_orderkey")
    },

    Q("window_frame_range",
      s"""SELECT o_orderkey, o_custkey, o_orderdate,
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER (PARTITION BY o_custkey
         |    ORDER BY o_orderdate
         |    RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing90
         |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("wfr_orders")
      s.sql(
        """SELECT o_orderkey, o_custkey, o_orderdate,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER (PARTITION BY o_custkey
          |    ORDER BY o_orderdate
          |    RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing90
          |FROM wfr_orders ORDER BY o_orderkey""".stripMargin)
    },

    Q("window_ntile_pct",
      s"""SELECT o_orderkey, o_orderstatus,
         |  CAST(ntile(4) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey) AS INT) AS nt,
         |  percent_rank() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey) AS pr,
         |  cume_dist() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey) AS cd
         |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_orderstatus").orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d).select(
        col("o_orderkey"), col("o_orderstatus"),
        ntile(4).over(w).as("nt"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
      ).orderBy("o_orderkey")
    },

    Q("topk_per_group",
      s"""SELECT o_custkey, o_orderkey, o_totalprice,
         |  CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
         |FROM orders
         |QUALIFY rn <= 3
         |ORDER BY o_custkey, rn""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    },

    // The custom whole-operator path for the same semantics
    // (graft.plans.TopKPerGroup): map-side partial bounded heaps, an
    // exchange that carries <= k rows per (partition, group) instead of
    // every row, and a final merge heap — the aggregate-style shape the
    // window formulation above cannot plan. The order (price DESC,
    // orderkey) is total within each group, so the kept multiset is
    // deterministic and the oracle is the plain window SQL.
    Q("topk_group_native",
      s"""SELECT o_custkey, o_orderkey, o_totalprice FROM (
         |  SELECT o_custkey, o_orderkey, o_totalprice,
         |    row_number() OVER (PARTITION BY o_custkey
         |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
         |  FROM orders) t WHERE rn <= 3
         |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin) { (s, d) =>
      graft.operators.TopK.perGroup(
          Tables.orders(s, d).select("o_custkey", "o_orderkey", "o_totalprice"),
          groupCols = Seq("o_custkey"),
          order = Seq("o_totalprice" -> true, "o_orderkey" -> false),
          k = 3)
        .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
    },
  )
}
