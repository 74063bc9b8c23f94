package graft

/** Hash-free string-based re-derivation of `text_verbatim_spans` — the
  * independent twin GoldenSpec checks the fixture against and
  * PropertySpec fuzzes with randomized planted corpora. Comparing actual
  * word tuples (no hashing anywhere) makes every agreement also a
  * collision check on the production double rolling hash.
  */
object SpanTwin {
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
