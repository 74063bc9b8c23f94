package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native `poly_hash_arr` expression (functions/PolyHashArr.scala)
  * must be indistinguishable from the declarative HOF fold it replaced —
  * the gram kernel's correctness (and its DuckDB oracle twins) hang on
  * that equivalence, so it is gated here on the real fixture AND on
  * crafted edge inputs the corpus never exercises.
  */
class PolyHashSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf

  private def bothHashes(wordsExpr: String) = {
    graft.functions.PolyHashArr.register(s)
    s.range(1).select(expr(wordsExpr).as("w"))
      .select(expr(queries.TextSim.wordHashHofExpr).as("hof"),
        expr("poly_hash_arr(w)").as("native"))
      .collect()(0)
  }

  test("native hash equals the HOF fold on every fixture document") {
    graft.functions.PolyHashArr.register(s)
    val mismatches = Tables.documents(s, d)
      .select(split(lower(col("text")), " ").as("w"))
      .select(expr(queries.TextSim.wordHashHofExpr).as("hof"),
        expr("poly_hash_arr(w)").as("native"))
      .filter("hof IS DISTINCT FROM native")
      .count()
    assert(mismatches == 0L)
  }

  test("edge inputs: empty word, multi-byte, surrogate pair, null element") {
    val r = bothHashes(
      "array('', 'a', 'héllo', '日本語', '😀x', cast(null as string))")
    assert(r.getSeq[Any](0) == r.getSeq[Any](1),
      s"HOF ${r.getSeq[Any](0)} vs native ${r.getSeq[Any](1)}")
    // and the fold really is the documented arithmetic: 'ab' = (97*31+98)
    val ab = bothHashes("array('ab')")
    assert(ab.getSeq[Long](1) == Seq(97L * 31 + 98))
  }

  test("null array and empty array propagate like the HOF form") {
    val n = bothHashes("cast(null as array<string>)")
    assert(n.isNullAt(0) && n.isNullAt(1))
    val e = bothHashes("cast(array() as array<string>)")
    assert(e.getSeq[Any](0).isEmpty && e.getSeq[Any](1).isEmpty)
  }

  test("interpreted eval path matches codegen") {
    // force the non-codegen path by evaluating the expression directly
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val words = new GenericArrayData(Array[Any](
      UTF8String.fromString("merge"), null, UTF8String.fromString("héllo")))
    val lit = Literal.create(words,
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))
    val out = graft.functions.PolyHashArr(lit).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(out.numElements() == 3 && out.isNullAt(1))
    val viaSql = bothHashes("array('merge', 'héllo')")
    assert(out.getLong(0) == viaSql.getSeq[Long](1).head)
    assert(out.getLong(2) == viaSql.getSeq[Long](1)(1))
  }

  test("wrong arity raises an analysis error, not a builder crash") {
    // both registration paths share the validated builders, so a 2-arg
    // poly_hash_arr / 1-arg dot_d must fail analysis with WRONG_NUM_ARGS
    // instead of silently ignoring extras or throwing NoSuchElementException
    graft.functions.PolyHashArr.register(s)
    graft.functions.DotProduct.register(s)
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      s.range(1).select(expr("poly_hash_arr(array('a'), array('b'))")).collect()
    }
    assert(e1.getMessage.contains("poly_hash_arr"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      s.range(1).select(expr("dot_d(array(1.0d))")).collect()
    }
    assert(e2.getMessage.contains("dot_d"))
  }
}
