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

  // ---- PolyHashArr.hashWord: the gram-hash base of the dedup family ----

  /** Independent reference fold: walk code points of the decoded string.
    * The production kernel's risk is its ASCII raw-byte fast path — this
    * re-derivation never looks at bytes. */
  private def refHash(s: String): Long = {
    var acc = 0L; var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }

  private def u(s: String) = org.apache.spark.unsafe.types.UTF8String.fromString(s)

  property("hashWord equals the code-point fold on arbitrary unicode") =
    forAll(Gen.listOf(Gen.choose(1, 0x10FFFF)
      .suchThat(cp => !Character.isSurrogate(cp.toChar) || cp > 0xFFFF))) { cps =>
      val s = new String(cps.flatMap(Character.toChars(_)).toArray)
      graft.functions.PolyHashArr.hashWord(u(s)) == refHash(s)
    }

  property("hashWord ASCII fast path equals the code-point fold") =
    forAll(Gen.listOf(Gen.choose(1, 127))) { cps =>
      val s = cps.map(_.toChar).mkString
      graft.functions.PolyHashArr.hashWord(u(s)) == refHash(s)
    }

  property("hashWord stays in [0, 1e9+7)") =
    forAll(Gen.alphaNumStr) { s =>
      val h = graft.functions.PolyHashArr.hashWord(u(s))
      h >= 0L && h < 1000000007L
    }
}
