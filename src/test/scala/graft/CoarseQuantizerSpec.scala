package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.CoarseQuantizer

/** Pure-JVM tests for the driver-side IVF quantizer fit (no Spark). */
class CoarseQuantizerSpec extends AnyFunSuite {

  private def planted(seed: Int): Array[Array[Float]] = {
    // 3 well-separated gaussian blobs in 8 dims, 60 points each
    val rnd = new scala.util.Random(seed)
    val centers = Array(
      Array.fill(8)(0.0f), Array.fill(8)(10.0f), Array.fill(8)(-10.0f))
    centers.flatMap { c =>
      Array.fill(60)(c.zipWithIndex.map { case (v, _) =>
        v + rnd.nextGaussian().toFloat * 0.5f })
    }
  }

  test("same seed and sample produce bit-identical centroids") {
    val s = planted(1)
    val a = CoarseQuantizer.fit(s, k = 4, iters = 5, seed = 42L)
    val b = CoarseQuantizer.fit(s, k = 4, iters = 5, seed = 42L)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("recovers planted blob centers within noise") {
    val s = planted(2)
    // k over-provisioned vs the 3 blobs (standard IVF practice; k = #blobs
    // can leave a blob unseeded and stuck in a local minimum): every blob
    // must end with a centroid at its mean (noise sd 0.5, separation 10).
    // Deterministic seed => no flake.
    val cents = CoarseQuantizer.fit(s, k = 8, iters = 10, seed = 42L)
    for (c <- Seq(0.0, 10.0, -10.0)) {
      val best = cents.map(ct => math.sqrt(ct.map(v => (v - c) * (v - c)).sum)).min
      assert(best < 1.0, s"no centroid near blob at $c (closest dist $best)")
    }
  }

  test("k larger than the sample degrades to one centroid per point") {
    val s = Array(Array(1.0f, 1.0f), Array(5.0f, 5.0f))
    val cents = CoarseQuantizer.fit(s, k = 16, iters = 3, seed = 42L)
    assert(cents.length == 2)
  }

  test("empty sample fails loudly") {
    intercept[IllegalArgumentException] {
      CoarseQuantizer.fit(Array.empty, k = 4, iters = 3, seed = 42L)
    }
  }
}
