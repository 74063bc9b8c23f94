package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star `[N]`): image/audio/video are
  * opaque `binary` columns with typed metadata; decode / feature-extract is
  * a per-partition batch operation so a real decoder (JNI image lib, ffmpeg
  * pipe, ONNX runtime) amortises its setup once per partition — the Spark
  * side (schema, partitioning, batch shape) is real and tested; only the
  * byte-level decode is a deterministic STUB because no media libraries
  * ship in this environment.
  */
object Multimodal {

  /** Attach an opaque media column + typed metadata struct to a text table.
    * (With real data the binary comes off the wire / object store as-is.)
    */
  def withMedia(docs: DataFrame): DataFrame =
    docs
      .withColumn("media", encode(col("text"), "UTF-8"))
      .withColumn("media_meta", struct(
        octet_length(col("media")).as("n_bytes"),
        lit("utf8-text").as("format"),
        (col("doc_id") % 3).cast("int").as("channel")))

  case class MediaRow(doc_id: Long, media: Array[Byte])
  case class MediaFeatures(doc_id: Long, n_bytes: Int, head_sum: Long,
      byte_entropy_q: Int, decoder: String)

  /** Per-partition decode + featurize. Deterministic, no driver round-trip,
    * no shuffle: runs wherever the media partition already lives.
    */
  def decodeFeatures(spark: SparkSession, df: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    df.select(col("doc_id"), col("media")).as[MediaRow].mapPartitions { it =>
      // STUB decoder: a real implementation opens the codec ONCE here
      // (per partition), then decodes each record's bytes. The fake below
      // is deterministic so tests and rows-only checks are stable.
      it.map { r =>
        val head = r.media.take(64).map(_ & 0xff)
        val counts = new Array[Int](256)
        r.media.foreach(b => counts(b & 0xff) += 1)
        val distinct = counts.count(_ > 0)
        MediaFeatures(r.doc_id, r.media.length, head.map(_.toLong).sum,
          distinct, "stub-v1")
      }
    }
  }

  /** 24 deterministic random hyperplanes (seed 42) packed into a 24-bit
    * sign signature — the bucketing primitive for LSH ANN (6 bands of 4
    * bits). Sized empirically on the fixture: 16 planes / 4 bands gave
    * recall@3 0.39; 24 planes / 6 bands gives 0.59 for ~1.4x the
    * candidate set (measured round 7), and wider 6-8 bit bands collapse
    * recall below 0.2 because fixture neighbours are only moderately
    * angularly close.
    */
  lazy val lshSignatureUdf: UserDefinedFunction = {
    val rnd = new scala.util.Random(42)
    val planes: Array[Array[Double]] = Array.fill(24)(Array.fill(64)(rnd.nextGaussian()))
    udf((emb: Seq[Float]) => {
      var sig = 0L
      var p = 0
      while (p < 24) {
        var dot = 0.0
        var i = 0
        val plane = planes(p)
        val n = math.min(emb.length, 64)
        while (i < n) { dot += emb(i) * plane(i); i += 1 }
        if (dot > 0) sig |= (1L << p)
        p += 1
      }
      sig
    })
  }
}
