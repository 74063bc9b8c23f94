package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The frozen IVF-PQ index model — the library-facing half of the
  * `ann_ivfpq` pipeline: a trained coarse-cell matrix plus the per-
  * subspace PQ codebooks, applied as ONE stateless map from (vec_id,
  * embedding) rows to (vec_id, cluster, codes) index rows — the batch
  * corpus table's exact schema. Because encoding is stateless, the same
  * model encodes a batch corpus and a STREAMING micro-batch identically —
  * the production index-append path: new embeddings arrive, are routed
  * to their cell and compressed to code ids against the frozen codebook,
  * and land in the cell-partitioned code table the search side scans
  * (cell partitioning = the file-level skipping `ann_ivfpq`'s broadcast
  * hash join does hash-side at query time). Retraining cadence is the
  * caller's policy; between refits the model is a broadcast-sized
  * closure (cells×64 + 16×16×4 longs).
  *
  * Arithmetic parity: quantization (`floor(x·10⁶ + 0.5)`), strict-<
  * argmins (lowest cell/code wins ties) and exact integer distances are
  * the ann_ivf/ann_ivfpq discipline verbatim, so an encode of the
  * training corpus reproduces the fit pipeline's own assignments
  * bit-for-bit (gated in StreamingSpec).
  *
  * @param cells    coarse centroid matrix, ×10⁶ integer space
  * @param codebook [subspace][code][dim] PQ centroids, ×10⁶ integer space
  */
final case class IvfPqModel(cells: Array[Array[Long]],
    codebook: Array[Array[Array[Long]]]) extends Serializable {

  /** The model's embedding dimensionality — every input must match it. */
  def dim: Int = cells(0).length

  private def quantize(emb: Seq[Float]): Array[Long] = {
    // fail loudly ON THE RECORD: a short vector would otherwise kill the
    // micro-batch with an index error (and poison restarts), a long one
    // would silently encode with the wrong subspace stride
    require(emb.length == dim,
      s"embedding dim ${emb.length} != model dim $dim")
    val qv = new Array[Long](emb.length)
    var i = 0
    while (i < qv.length) {
      qv(i) = math.floor(emb(i).toDouble * 1000000d + 0.5d).toLong; i += 1
    }
    qv
  }

  private def argminCell(qv: Array[Long]): Int = {
    var best = 0; var bestD = Long.MaxValue
    var c = 0
    while (c < cells.length) {
      val cv = cells(c); var d2 = 0L; var j = 0
      while (j < cv.length) { val df0 = qv(j) - cv(j); d2 += df0 * df0; j += 1 }
      if (d2 < bestD) { bestD = d2; best = c }
      c += 1
    }
    best
  }

  private def encodeCodes(qv: Array[Long]): Array[Long] = {
    val subDim = dim / codebook.length // model geometry, never input-derived
    Array.tabulate(codebook.length) { sub =>
      val cents = codebook(sub)
      var best = 0; var bestD = Long.MaxValue
      var c = 0
      while (c < cents.length) {
        val cv = cents(c); var d2 = 0L; var i = 0
        while (i < cv.length) {
          val df0 = qv(sub * subDim + i) - cv(i); d2 += df0 * df0; i += 1
        }
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      best.toLong
    }
  }

  /** Encode (vec_id, embedding) rows — batch or streaming — into index
    * rows (vec_id, cluster, codes). Stateless map: safe under any
    * streaming output mode, no shuffle introduced. Column names AND
    * types match the batch corpus table (`LlmOps.ivfPqCorpus`:
    * cluster INT, codes ARRAY<BIGINT>) exactly, so streamed appends
    * land schema-compatible with the table the search side scans —
    * a rename-or-cast at the append site would be the silent-drift
    * trap the StreamingSpec parity gate exists to prevent. */
  def encode(df: DataFrame): DataFrame = {
    val encodeU = udf((emb: Seq[Float]) => {
      val qv = quantize(emb)
      (argminCell(qv), encodeCodes(qv).toSeq)
    })
    df.select(col("vec_id"), encodeU(col("embedding")).as("e"))
      .select(col("vec_id"), col("e._1").as("cluster"), col("e._2").as("codes"))
  }
}
