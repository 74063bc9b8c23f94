package graft

/** Hash-free string-based re-derivation of `text_verbatim_spans` — the
  * independent twin GoldenSpec checks the fixture against and
  * PropertySpec fuzzes with randomized planted corpora. Comparing actual
  * word tuples (no hashing anywhere) makes every agreement also a
  * collision check on the production double rolling hash.
  */
object SpanTwin {

  /** String-based twin of `span_attribution`: per ordered doc pair, the
    * count of matching L-gram window pairs (df-capped) and the covering
    * ranges — same semantics, zero hashing. */
  def stringAttribution(docsIn: Seq[(Long, Seq[String])])
      : Seq[(Long, Long, Long, Long, Long, Long, Long)] = {
    val L = queries.TextSim.SpanGramLen
    val cap = queries.TextSim.SpanAttribDfCap
    val docs = docsIn.filter(_._2.length >= L)
    val gramPos = scala.collection.mutable.HashMap
      .empty[Seq[String], scala.collection.mutable.ListBuffer[(Long, Int)]]
    docs.foreach { case (id, w) =>
      w.sliding(L).zipWithIndex.foreach { case (g, p) =>
        gramPos.getOrElseUpdate(g, scala.collection.mutable.ListBuffer()) += ((id, p + 1))
      }
    }
    val agg = scala.collection.mutable.HashMap
      .empty[(Long, Long), (Long, Long, Long, Long, Long)]
    gramPos.values.foreach { occ =>
      if (occ.map(_._1).distinct.size >= 2 && occ.map(_._1).distinct.size <= cap) {
        for ((da, ia) <- occ; (db, ib) <- occ if da < db) {
          val cur = agg.getOrElse((da, db),
            (0L, Long.MaxValue, Long.MinValue, Long.MaxValue, Long.MinValue))
          agg((da, db)) = (cur._1 + 1, math.min(cur._2, ia), math.max(cur._3, ia),
            math.min(cur._4, ib), math.max(cur._5, ib))
        }
      }
    }
    agg.toSeq.map { case ((da, db), (n, as, ae, bs, be)) =>
      (da, db, n, as, ae + L - 1, bs, be + L - 1)
    }.sortBy(t => (t._1, t._2))
  }

  def stringSpans(docsIn: Seq[(Long, Seq[String])]): Seq[(Long, Long, Long, Long, Long)] = {
    val L = queries.TextSim.SpanGramLen
    val docs = docsIn.filter(_._2.length >= L)
    val gramDocs = scala.collection.mutable.HashMap
      .empty[Seq[String], scala.collection.mutable.Set[Long]]
    docs.foreach { case (id, w) =>
      w.sliding(L).foreach(g => gramDocs.getOrElseUpdate(g, scala.collection.mutable.Set()) += id)
    }
    docs.sortBy(_._1).flatMap { case (id, w) =>
      val hitPos = w.sliding(L).zipWithIndex.collect {
        case (g, idx) if gramDocs(g).size >= 2 => idx + 1 // 1-based
      }.toSeq
      val spans = scala.collection.mutable.ListBuffer[(Long, Long, Long, Long, Long)]()
      var run = scala.collection.mutable.ListBuffer[Int]()
      def close(): Unit = if (run.nonEmpty) {
        val df = run.map(i => gramDocs(w.slice(i - 1, i - 1 + L)).size.toLong).max
        spans += ((id, run.head.toLong, (run.last + L - 1).toLong,
          (run.last - run.head + L).toLong, df))
        run = scala.collection.mutable.ListBuffer[Int]()
      }
      hitPos.foreach { i =>
        if (run.nonEmpty && i != run.last + 1) close()
        run += i
      }
      close()
      spans
    }
  }
}
