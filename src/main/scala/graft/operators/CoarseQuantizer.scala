package graft.operators

/** Driver-side seeded Lloyd's algorithm for IVF coarse quantizers.
  *
  * An IVF index needs k (here 16) centroids, not a clustering
  * deliverable — training on a bounded sample is the standard practice
  * (FAISS trains its quantizers on a capped sample for the same reason).
  * A distributed KMeans fit costs one full job per Lloyd pass plus
  * pipeline overhead; for k*dim doubles learned from a sample that is
  * collected anyway under a hard row bound, the whole fit is a few
  * million flops — microseconds on the driver, zero Spark jobs.
  * Assignment of the FULL corpus to centroids stays distributed (one
  * map-side pass, see call site).
  *
  * Deterministic: seeded init (sample indices from a seeded RNG), fixed
  * iteration count, no data-dependent early exit. Empty clusters keep
  * their previous centroid (same as re-seeding would be unstable).
  */
object CoarseQuantizer {

  /** `sample` row-major float vectors (all same dim); returns k centroids
    * as double vectors. Assignment metric: squared euclidean, matching
    * textbook Lloyd.
    */
  def fit(sample: Array[Array[Float]], k: Int, iters: Int, seed: Long): Array[Array[Double]] = {
    require(sample.nonEmpty, "quantizer fit needs a non-empty sample")
    val n = sample.length
    val dim = sample(0).length
    val rnd = new scala.util.Random(seed)
    // seeded init: the first min(k, n) rows of a seeded index shuffle
    val order = rnd.shuffle((0 until n).toVector)
    val centroids = Array.tabulate(math.min(k, n)) { c =>
      sample(order(c)).map(_.toDouble)
    }
    val assign = new Array[Int](n)
    var it = 0
    while (it < iters) {
      // assign
      var i = 0
      while (i < n) {
        var best = 0; var bestD = Double.MaxValue
        var cc = 0
        while (cc < centroids.length) {
          var d2 = 0.0; var j = 0
          val cent = centroids(cc); val v = sample(i)
          while (j < dim) { val df = v(j) - cent(j); d2 += df * df; j += 1 }
          if (d2 < bestD) { bestD = d2; best = cc }
          cc += 1
        }
        assign(i) = best
        i += 1
      }
      // update
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val counts = new Array[Long](centroids.length)
      i = 0
      while (i < n) {
        val a = assign(i); val v = sample(i); var j = 0
        val s = sums(a)
        while (j < dim) { s(j) += v(j); j += 1 }
        counts(a) += 1
        i += 1
      }
      var cc = 0
      while (cc < centroids.length) {
        if (counts(cc) > 0L) {
          var j = 0
          while (j < dim) { centroids(cc)(j) = sums(cc)(j) / counts(cc); j += 1 }
        } // empty cluster: keep previous centroid
        cc += 1
      }
      it += 1
    }
    centroids
  }
}
