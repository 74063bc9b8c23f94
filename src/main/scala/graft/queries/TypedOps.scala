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

  val all: Seq[Q] = Seq(

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
          expr(dsum("l_extendedprice * (1 - l_discount)")).as("rev_big"))
        .orderBy("l_returnflag")
    },
  )
}
