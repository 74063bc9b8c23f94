package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every SURVEY §2 key is one `Q` in a category module; this object only
  * aggregates them into the maps the driver consumes.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.flagship(spark, "/root/testdata/sf0.001")

  lazy val all: Seq[Q] =
    Relational.all ++ Windows.all ++ Composites.all ++ Scalars.all ++
      TextSim.all ++ StreamingBatch.all ++ Udx.all ++ LlmOps.all ++
      TypedOps.all ++ Curation.all ++ Pipeline.all ++ Stats.all ++ Features.all ++
      Corpus.all ++ Retrieval.all

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.key -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.key -> _)).toMap
}
