package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.CoarseQuantizer

/** Pure-JVM tests for the driver-side IVF quantizer fit (no Spark).
  * r12: the fit is deterministic integer Lloyd (no seed parameter) over
  * ×10⁶-quantized vectors — same-input bit-identity is by construction,
  * so the tests pin blob recovery, tie/degenerate behavior, and the
  * empty-cluster keep-previous rule the SQL oracle twin relies on.
  */
class CoarseQuantizerSpec extends AnyFunSuite {

  /** 3 well-separated blobs in 8 dims, 60 points each, pre-quantized the
    * way the ann_ivf call site quantizes floats. */
  private def planted(seed: Int): Array[Array[Long]] = {
    val rnd = new scala.util.Random(seed)
    val centers = Array(
      Array.fill(8)(0.0), Array.fill(8)(10.0), Array.fill(8)(-10.0))
    centers.flatMap { c =>
      Array.fill(60)(c.map(v =>
        math.floor((v + rnd.nextGaussian() * 0.5) * 1000000 + 0.5).toLong))
    }
  }

  test("same sample produces bit-identical centroids (no RNG anywhere)") {
    val s = planted(1)
    val a = CoarseQuantizer.fitInt(s, k = 4, iters = 5)
    val b = CoarseQuantizer.fitInt(s.map(_.clone()), k = 4, iters = 5)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("recovers planted blob centers within noise") {
    val s = planted(2)
    // k over-provisioned vs the 3 blobs (standard IVF practice; k = #blobs
    // can leave a blob unseeded and stuck in a local minimum): every blob
    // must end with a centroid at its mean (noise sd 0.5, separation 10,
    // ×10⁶ integer scale).
    val cents = CoarseQuantizer.fitInt(s, k = 8, iters = 10)
    for (c <- Seq(0.0, 10.0, -10.0)) {
      val target = c * 1000000
      val best = cents.map(ct =>
        math.sqrt(ct.map(v => (v - target) * (v - target)).sum)).min
      assert(best < 1000000.0, s"no centroid near blob at $c (closest dist $best)")
    }
  }

  test("k larger than the sample degrades to one centroid per point") {
    val s = Array(Array(1000000L, 1000000L), Array(5000000L, 5000000L))
    val cents = CoarseQuantizer.fitInt(s, k = 16, iters = 3)
    assert(cents.length == 2)
  }

  test("init is the first k rows of the sample order") {
    val s = planted(3)
    val cents = CoarseQuantizer.fitInt(s, k = 4, iters = 0)
    assert(cents.map(_.toSeq).toSeq == s.take(4).map(_.toSeq).toSeq,
      "zero iterations must return the deterministic init unchanged")
  }

  test("truncating integer mean matches a BigInt re-derivation") {
    // one round, one cluster: mean of known vectors, negatives included —
    // Long `/` truncates toward zero, the behavior the DuckDB `//` twin
    // mirrors (kmeans_iter discipline)
    val s = Array(Array(-5L, 7L), Array(-4L, 8L))
    val cents = CoarseQuantizer.fitInt(s, k = 1, iters = 1)
    assert(cents(0).toSeq == Seq(-4L, 7L), s"got ${cents(0).toSeq}")
  }

  test("empty sample fails loudly") {
    intercept[IllegalArgumentException] {
      CoarseQuantizer.fitInt(Array.empty, k = 4, iters = 3)
    }
  }
}
