package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the write-side clustering layouts (sources/Layout): content
  * preservation, the maxRecordsPerFile bound, z-value bit-exactness vs a
  * BigInt re-derivation, and the actual skipping payoff — per-file
  * min/max bounding boxes measured from the files each layout wrote.
  */
class LayoutSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf
  private val base = "/tmp/graft_layout_spec"

  private def ev = Tables.events(s, d)
    .select(col("event_id"), col("user_id"), col("ts_us"),
      expr("shiftright(ts_us, 26)").as("tbucket"))

  /** per-file [min,max] of both dimensions, from what was actually written */
  private def boxes(path: String): Seq[(Long, Long, Long, Long)] =
    s.read.parquet(path)
      .groupBy(input_file_name())
      .agg(min("user_id"), max("user_id"), min("tbucket"), max("tbucket"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq

  private def touched(bs: Seq[(Long, Long, Long, Long)],
      u: Option[(Long, Long)], t: Option[(Long, Long)]): Int =
    bs.count { case (ulo, uhi, tlo, thi) =>
      u.forall { case (a, b) => uhi >= a && ulo <= b } &&
        t.forall { case (a, b) => thi >= a && tlo <= b }
    }

  test("zvalue matches a BigInt interleave re-derivation and is order-isomorphic per cell") {
    val rows = ev.limit(512)
      .withColumn("z", sources.Layout.zvalue(col("user_id"), col("tbucket"), 16))
      .collect().map(r => (r.getLong(1), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (u, t, z) =>
      val expect = (0 until 16).foldLeft(0L) { (acc, i) =>
        acc | (((u >> i) & 1L) << (2 * i)) | (((t >> i) & 1L) << (2 * i + 1))
      }
      assert(z == expect, s"u=$u t=$t")
    }
  }

  test("range-sorted and z-ordered writes preserve content and respect the file cap") {
    val in = ev.cache()
    val n = in.count()
    sources.Layout.writeRangeSorted(in, s"$base/by_user", "user_id",
      files = 8, maxRecordsPerFile = 256)
    sources.Layout.writeZOrdered(in, s"$base/zorder", col("user_id"),
      col("tbucket"), bits = 16, files = 8, maxRecordsPerFile = 256)
    for (p <- Seq(s"$base/by_user", s"$base/zorder")) {
      val back = s.read.parquet(p)
      assert(back.count() == n)
      assert(back.select("event_id").except(in.select("event_id")).isEmpty &&
        in.select("event_id").except(back.select("event_id")).isEmpty)
      val perFile = back.groupBy(input_file_name()).count()
        .collect().map(_.getLong(1))
      assert(perFile.forall(_ <= 256), s"file over cap in $p: ${perFile.max}")
    }
    in.unpersist()
  }

  test("z-order skips files on BOTH dimensions; single-key sort only on its own") {
    val stats = ev.agg(min("user_id"), max("user_id"), min("tbucket"), max("tbucket"))
      .collect().head
    val (ulo, uhi, tlo, thi) =
      (stats.getLong(0), stats.getLong(1), stats.getLong(2), stats.getLong(3))
    // a ~25%-of-domain box on each dimension
    val uBox = (ulo, ulo + (uhi - ulo) / 4)
    val tBox = (tlo, tlo + (thi - tlo) / 4)
    val byUser = boxes(s"$base/by_user")
    val zord = boxes(s"$base/zorder")
    assert(byUser.size >= 4 && zord.size >= 4, "too few files to measure skipping")

    // user-only predicate: the user-sorted layout prunes (disjoint ranges)
    val userSortedU = touched(byUser, Some(uBox), None)
    assert(userSortedU < byUser.size, "user-sorted layout failed to prune on user_id")
    // time-only predicate: user-sorted files all span ~the full time range
    // (no clustering on time), z-order must touch strictly fewer files
    val userSortedT = touched(byUser, None, Some(tBox))
    val zT = touched(zord, None, Some(tBox))
    assert(zT < userSortedT,
      s"z-order should prune on time where user-sort cannot: z=$zT vs sorted=$userSortedT/${byUser.size}")
    // 2-D box: z-order prunes at least as well as on either dim alone
    val zBoth = touched(zord, Some(uBox), Some(tBox))
    assert(zBoth <= zT && zBoth < zord.size)
  }

  test("dynamic partition overwrite refreshes one partition and leaves the rest intact") {
    // the incremental-refresh contract a partitioned 100 TB lake depends
    // on: with partitionOverwriteMode=dynamic, an overwrite replaces ONLY
    // the partitions present in the incoming batch; the default STATIC
    // mode truncates the whole table first — a catastrophic difference,
    // pinned here so a config regression is a test failure
    val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
    val out = s"$base/dyn_overwrite"
    docs.write.mode("overwrite").partitionBy("lang").parquet(out)
    val total = docs.count()
    val en = docs.filter(col("lang") === "en")
    val refreshed = en.withColumn("n_chars", col("n_chars") + 1000000L)
    val prev = s.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    try {
      s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      refreshed.write.mode("overwrite").partitionBy("lang").parquet(out)
    } finally prev match {
      case Some(v) => s.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => s.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    val back = s.read.parquet(out)
    assert(back.count() == total, "non-en partitions must survive the overwrite")
    assert(back.filter(col("lang") === "en").agg(min("n_chars")).head.getLong(0)
      >= 1000000L, "en partition must carry the refreshed values")
    assert(back.filter(col("lang") =!= "en").agg(max("n_chars")).head.getLong(0)
      < 1000000L, "other partitions must be untouched originals")
  }

  test("zstd writes measurably smaller text parquet than snappy at equal content") {
    // codec choice is a first-order storage lever at 100 TB; both codecs
    // must round-trip identically, and zstd should win on text
    def size(dir: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) f.length() else 0L
      walk(new java.io.File(dir))
    }
    val docs = Tables.documents(s, d).select("doc_id", "text")
    for (codec <- Seq("snappy", "zstd"))
      docs.write.mode("overwrite").option("compression", codec)
        .parquet(s"$base/codec_$codec")
    val (snappy, zstd) = (size(s"$base/codec_snappy"), size(s"$base/codec_zstd"))
    assert(s.read.parquet(s"$base/codec_zstd").count() == docs.count())
    assert(s.read.parquet(s"$base/codec_zstd").except(docs).count() == 0)
    assert(zstd < snappy,
      s"zstd ($zstd B) should beat snappy ($snappy B) on text")
  }
}
