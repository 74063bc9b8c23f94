package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic gate for the rows-only `mm_decode_features` key and the
  * multimodal plumbing under it (the stub decoder has no SQL oracle by
  * design — deflate-style JVM artifact — so THIS spec is its correctness
  * contract): the media column round-trips the documents' bytes, the
  * per-partition featurizer is deterministic and 1:1, and every emitted
  * feature matches a driver-side brute re-derivation of the documented
  * stub formula (UTF-8 byte length, sum of the first 64 unsigned bytes,
  * distinct byte count, versioned decoder tag).
  */
class MultimodalSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterEach {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf
  override def afterEach(): Unit = { s.catalog.clearCache(); super.afterEach() }

  test("withMedia: binary column is the UTF-8 text bytes with typed metadata") {
    val rows = multimodal.Multimodal.withMedia(Tables.documents(s, d))
      .select("doc_id", "text", "media", "media_meta.n_bytes",
        "media_meta.format", "media_meta.channel")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bytes = r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      assert(java.util.Arrays.equals(r.getAs[Array[Byte]](2), bytes),
        s"doc ${r.getLong(0)}: media != utf8(text)")
      assert(r.getInt(3) == bytes.length, "n_bytes meta")
      assert(r.getString(4) == "utf8-text")
      assert(r.getInt(5) == (r.getLong(0) % 3).toInt, "channel meta")
    }
  }

  test("mm_decode_features: 1:1, deterministic, and matches the brute stub formula") {
    val out = SparkEntry.queries("mm_decode_features")(s, d).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getInt(3), r.getString(4)))).toMap
    val again = SparkEntry.queries("mm_decode_features")(s, d).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getInt(3), r.getString(4)))).toMap
    assert(out == again, "decode features must be run-to-run deterministic")
    val docs = Tables.documents(s, d).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.size == docs.length, "featurizer must emit exactly one row per doc")
    docs.foreach { case (id, text) =>
      val media = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val headSum = media.take(64).map(b => (b & 0xff).toLong).sum
      val distinct = media.map(_ & 0xff).distinct.length
      val (nb, hs, dq, tag) = out(id)
      assert(nb == media.length, s"doc $id n_bytes")
      assert(hs == headSum, s"doc $id head_sum")
      assert(dq == distinct, s"doc $id byte_entropy_q")
      assert(tag == "stub-v1", s"doc $id decoder tag — bump THIS test when" +
        " swapping the stub for a real codec")
    }
  }

  test("decodeFeatures plans map-only: no exchange before the featurizer") {
    val ds = multimodal.Multimodal.decodeFeatures(s,
      multimodal.Multimodal.withMedia(Tables.documents(s, d)))
    val plan = ds.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"decode must run where the media partition lives:\n$plan")
  }
}
