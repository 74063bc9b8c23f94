package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Q

/** Hybrid-retrieval suite (SURVEY.md §2.13 extension, round 12): the two
  * retrieval operations a RAG-style training-data pipeline runs on top of
  * the lexical (`text_bm25`) and dense (`sim_cosine_topk`) rankers the
  * engine already has —
  *
  *   - `retrieval_rrf`: Reciprocal Rank Fusion of the BM25 ranking and a
  *     dense cosine ranking against a fixed probe (the standard hybrid
  *     search combiner: score = Σ 1/(k + rank), k = 60);
  *   - `retrieval_eval`: ranking-quality metrics (MRR@10, DCG/NDCG@10)
  *     of the dense ranking against the embedding labels — the eval loop
  *     that decides whether a retriever change ships.
  *
  * Determinism (SURVEY §7.3): ranks come from `row_number` ordered by
  * (bit-identical-cross-engine cosine | exact-integer BM25) with id
  * tie-breaks; every fused/metric score is then EXACT INTEGER arithmetic —
  * RRF terms are integer divisions, and the NDCG log₂ discount weights are
  * baked as integer literals computed ONCE in Scala and spliced into both
  * engines' SQL, so no double is ever summed across rows.
  */
object Retrieval {

  /** RRF constant k: dampens the top-rank dominance (Cormack et al.'s
    * standard 60). One copy, spliced into both engines' expressions. */
  private val RrfK = 60

  /** Candidate-list depth per ranker. */
  private val CandK = 50

  /** Reciprocal Rank Fusion of the two rankers a hybrid search runs in
    * parallel: the `Bm25` lexical ranking (shared kernel with `text_bm25`)
    * and a dense cosine ranking of the corpus against the fixed probe
    * vector `vec_id = 0`. Each ranker contributes its top-[[CandK]]; a doc
    * in both lists sums both reciprocal terms (`floor(1e9/(60+rank))`,
    * exact integer), a doc in one list gets that term alone (full outer
    * join), and the fused top-20 is the answer set.
    *
    * Scale shape at 100 TB: each candidate list is a distributed
    * TakeOrdered heap (map-only scoring — BM25 joins a one-row-per-lang
    * broadcast, cosine joins a one-row broadcast probe — then per-task
    * top-k, no global sort); the global `row_number` windows run AFTER the
    * limit, over ≤ [[CandK]] rows; the fusion join is two ≤ 50-row sides.
    * Nothing in the plan grows with the corpus except the two scans.
    */
  private val retrievalRrf = Q("retrieval_rrf",
    s"""WITH ${Bm25.scoredCtes},
       |lex AS (SELECT doc_id, row_number() OVER (ORDER BY bm25_e6 DESC, doc_id) AS r_lex
       |  FROM scored QUALIFY r_lex <= $CandK),
       |p AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
       |ds AS (SELECT b.vec_id AS doc_id, ${TextSim.cosineSql("p", "b")} AS sim
       |  FROM embeddings b, p WHERE b.vec_id <> 0),
       |dense AS (SELECT doc_id, row_number() OVER (ORDER BY sim DESC, doc_id) AS r_dense
       |  FROM ds QUALIFY r_dense <= $CandK),
       |u AS (SELECT coalesce(l.doc_id, de.doc_id) AS doc_id,
       |    CAST(coalesce(l.r_lex, 0) AS INT) AS r_lex,
       |    CAST(coalesce(de.r_dense, 0) AS INT) AS r_dense
       |  FROM lex l FULL OUTER JOIN dense de ON l.doc_id = de.doc_id)
       |SELECT doc_id, r_lex, r_dense,
       |  CAST((CASE WHEN r_lex > 0 THEN 1000000000 // ($RrfK + r_lex) ELSE 0 END)
       |     + (CASE WHEN r_dense > 0 THEN 1000000000 // ($RrfK + r_dense) ELSE 0 END) AS BIGINT) AS rrf_e9
       |FROM u ORDER BY rrf_e9 DESC, doc_id LIMIT 20""".stripMargin) { (s, d) =>
    val wLex = Window.orderBy(col("bm25_e6").desc, col("doc_id"))
    val lexTop = Bm25.scored(s, d).select("doc_id", "bm25_e6")
      .orderBy(col("bm25_e6").desc, col("doc_id")).limit(CandK)
      .withColumn("r_lex", row_number().over(wLex))
      .select("doc_id", "r_lex")
    // the dense ranking IS the shared broadcast-probe cosine kernel with
    // the probe set narrowed to vec_id = 0 (probeLimit = 1)
    val wDense = Window.orderBy(col("sim").desc, col("doc_id"))
    val denseTop = TextSim.simPairs(s, d, probeLimit = 1)
      .select(col("b_id").as("doc_id"), col("sim"))
      .orderBy(col("sim").desc, col("doc_id")).limit(CandK)
      .withColumn("r_dense", row_number().over(wDense))
      .select("doc_id", "r_dense")
    lexTop.join(denseTop, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("r_lex"), lit(0)).cast("int").as("r_lex"),
        coalesce(col("r_dense"), lit(0)).cast("int").as("r_dense"))
      .withColumn("rrf_e9", expr(
        s"""cast((CASE WHEN r_lex > 0 THEN 1000000000 div ($RrfK + r_lex) ELSE 0 END)
           | + (CASE WHEN r_dense > 0 THEN 1000000000 div ($RrfK + r_dense) ELSE 0 END) as bigint)""".stripMargin))
      .orderBy(col("rrf_e9").desc, col("doc_id"))
      .limit(20)
  }

  /** Integer NDCG@10 discount weights: w(i) = floor(1e9 / log₂(i+1) + .5),
    * computed ONCE here and spliced into both engines' SQL as literals —
    * the only way a log-weighted sum stays aggregation-order-independent
    * (each term is an exact integer, so the sum is exact).
    */
  private val NdcgW: IndexedSeq[Long] = (1 to 10).map(i =>
    math.floor(1e9 / (math.log(i + 1.0) / math.log(2.0)) + 0.5).toLong)

  /** `CASE rnk_expr` mapping rank → discount weight literal. */
  private def wCase(rnk: String): String =
    "CASE " + (1 to 10).map(i => s"WHEN $rnk = $i THEN ${NdcgW(i - 1)}")
      .mkString(" ") + " ELSE 0 END"

  /** `CASE n_rel` mapping #relevant → ideal-DCG prefix-sum literal. */
  private def idcgCase(nRel: String): String =
    "CASE " + (1 to 10).map(n => s"WHEN $nRel = $n THEN ${NdcgW.take(n).sum}")
      .mkString(" ") + " ELSE 0 END"

  /** Retrieval-quality evaluation of the dense ranker: for each of the 20
    * probe vectors, rank the rest of the corpus by cosine, take the top 10,
    * call a neighbor relevant when its label matches the probe's, and
    * report the standard ranking metrics — hit count, first-relevant rank,
    * MRR (`floor(1e6/first_rel)`), DCG/IDCG/NDCG@10 with the integer
    * log₂ discounts of [[NdcgW]]. Every output column is exact integer
    * arithmetic over the (bit-identical) cosine ranking.
    *
    * Scale shape: probe side bounded and broadcast, corpus side map-only;
    * the per-probe top-10 is the `row_number <= k` idiom TopKRewrite plans
    * as a bounded heap; the metric aggregation touches 200 rows.
    */
  private val retrievalEval = Q("retrieval_eval",
    s"""WITH pr AS (SELECT vec_id, label, embedding FROM embeddings WHERE vec_id < 20),
       |sims AS (SELECT pr.vec_id AS a_id, pr.label AS a_lbl,
       |    b.vec_id AS b_id, b.label AS b_lbl,
       |    ${TextSim.cosineSql("pr", "b")} AS sim
       |  FROM pr JOIN embeddings b ON pr.vec_id <> b.vec_id),
       |top AS (SELECT a_id, CASE WHEN b_lbl = a_lbl THEN 1 ELSE 0 END AS rel,
       |    row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, b_id) AS rnk
       |  FROM sims QUALIFY rnk <= 10),
       |ag AS (SELECT a_id, CAST(sum(rel) AS BIGINT) AS n_rel,
       |    CAST(sum(rel * (${wCase("rnk")})) AS BIGINT) AS dcg_e9,
       |    min(CASE WHEN rel = 1 THEN rnk END) AS first_rel
       |  FROM top GROUP BY a_id)
       |SELECT a_id AS probe_id, CAST(n_rel AS INT) AS n_rel,
       |  CAST(coalesce(first_rel, 0) AS INT) AS first_rel,
       |  CAST(CASE WHEN first_rel IS NULL THEN 0 ELSE 1000000 // first_rel END AS BIGINT) AS mrr_e6,
       |  dcg_e9,
       |  CAST(${idcgCase("n_rel")} AS BIGINT) AS idcg_e9,
       |  CAST(CASE WHEN n_rel = 0 THEN 0
       |    ELSE (1000000 * dcg_e9) // (${idcgCase("n_rel")}) END AS BIGINT) AS ndcg_e6
       |FROM ag ORDER BY probe_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("a_id").orderBy(col("sim").desc, col("b_id"))
    val top = TextSim.simPairs(s, d, probeLimit = 20)
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 10)
      .withColumn("rel", expr("CASE WHEN lbl = a_lbl THEN 1 ELSE 0 END"))
    top.groupBy("a_id").agg(
      sum("rel").cast("bigint").as("n_rel"),
      sum(expr(s"rel * (${wCase("rnk")})")).cast("bigint").as("dcg_e9"),
      min(expr("CASE WHEN rel = 1 THEN rnk END")).as("first_rel"))
      .select(col("a_id").as("probe_id"),
        col("n_rel").cast("int").as("n_rel"),
        coalesce(col("first_rel"), lit(0)).cast("int").as("first_rel"),
        expr("cast(CASE WHEN first_rel IS NULL THEN 0 ELSE 1000000 div first_rel END as bigint)").as("mrr_e6"),
        col("dcg_e9"),
        expr(s"cast(${idcgCase("n_rel")} as bigint)").as("idcg_e9"),
        expr(s"""cast(CASE WHEN n_rel = 0 THEN 0
                 | ELSE (1000000 * dcg_e9) div (${idcgCase("n_rel")}) END as bigint)""".stripMargin).as("ndcg_e6"))
      .orderBy("probe_id")
  }

  val all: Seq[Q] = Seq(retrievalRrf, retrievalEval)
}
