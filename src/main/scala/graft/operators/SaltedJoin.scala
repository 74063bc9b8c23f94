package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for a large⋈small equi-join where a handful of hot keys
  * would serialise into single shuffle partitions: deterministically salt
  * the big side into `salts` sub-keys and replicate the small side once per
  * salt, so a hot key spreads over `salts` partitions.
  *
  * Deterministic (no `rand()`): the salt is `pmod(hash(all big-side
  * columns), salts)` — same rows always land in the same salt bucket, so
  * results are reproducible and retry-safe. AQE's skew-join splitting
  * covers most cases automatically; this is the explicit tool for joins
  * AQE can't split (e.g. when the skewed side must stay sorted).
  */
object SaltedJoin {
  def inner(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    val bigCols = big.columns.map(col).toIndexedSeq
    val b = big.withColumn("__salt", pmod(hash(bigCols: _*), lit(salts)))
    val sm = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    b.join(sm, Seq(key, "__salt")).drop("__salt")
  }
}
