package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.queries.Udx.{GeoBuf, GeoMean}

/** ScalaCheck properties for the pure kernels whose determinism the oracle
  * parity depends on (SURVEY §5.3). The central claim of `GeoMean` is that
  * its fixed-point buffer makes the aggregate ORDER- and
  * PARTITIONING-INDEPENDENT — exactly what `Aggregator` requires for
  * correct distributed execution.
  */
object CheckProps extends Properties("graft.kernels") {

  private val positives = Gen.nonEmptyListOf(Gen.choose(1e-3, 1e7))

  private def reduceAll(xs: Seq[Double]): GeoBuf =
    xs.foldLeft(GeoMean.zero)(GeoMean.reduce)

  property("GeoMean is order-independent") = forAll(positives) { xs =>
    GeoMean.finish(reduceAll(xs)) == GeoMean.finish(reduceAll(xs.reverse))
  }

  property("GeoMean merge of any split equals single-pass reduce") =
    forAll(positives, Gen.choose(0, 1000)) { (xs, cut) =>
      val k = cut % (xs.length + 1)
      val (a, b) = xs.splitAt(k)
      GeoMean.merge(reduceAll(a), reduceAll(b)) == reduceAll(xs)
    }

  property("GeoMean approximates exp(mean(ln)) to 1e-9 relative") =
    forAll(positives) { xs =>
      val expected = math.exp(xs.map(math.log).sum / xs.length)
      val got = GeoMean.finish(reduceAll(xs))
      math.abs(got - expected) <= 1e-9 * math.max(1.0, expected)
    }
}
