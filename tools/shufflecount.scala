// Per-key SHUFFLE-RECORD probe — the data-volume twin of
// tools/actioncount.scala (job counts) and PlansSpec's parquet-scan gate.
// Shuffle write records are the builder-controllable VOLUME exposure: a
// re-plan that quietly doubles what crosses the wire (a lost partial
// aggregate, a join that stopped broadcasting, a window that lost its
// pre-collapse) changes this number even when scan and job counts stay
// put. Records, not bytes: bytes wobble with codec framing; record counts
// are exact for a deterministic plan at a fixed shuffle-partition config.
// Counts records written (and read, informational) (a) while the query
// DataFrame is CONSTRUCTED (pinOnce materializations, model fits, boundary
// collects) and (b) while it runs once through a noop sink. clearCache
// between keys so pinned kernels are billed to the key that builds them.
//   SPARK_GRAFT_KEYS=a,b,c /opt/spark/bin/spark-shell --master 'local[4]' \
//     --conf spark.sql.shuffle.partitions=4 --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --jars target/scala-2.13/sd2_drp_experimentgenspark_2.13-0.1.0.jar \
//     -I tools/shufflecount.scala < /dev/null
{
spark.sparkContext.setLogLevel("ERROR")
val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
val keys = sys.env.get("SPARK_GRAFT_KEYS").map(_.split(",").toSeq)
  .getOrElse(graft.SparkEntry.queries.keys.toSeq.sorted)
val wr = new java.util.concurrent.atomic.AtomicLong(0)
val rd = new java.util.concurrent.atomic.AtomicLong(0)
spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
  override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
    if (t.taskMetrics != null) {
      wr.addAndGet(t.taskMetrics.shuffleWriteMetrics.recordsWritten)
      rd.addAndGet(t.taskMetrics.shuffleReadMetrics.recordsRead)
    }
})
// listener events are async: poll until two consecutive reads agree
def settled(c: java.util.concurrent.atomic.AtomicLong): Long = {
  var prev = -1L; var cur = c.get()
  while (cur != prev) { Thread.sleep(50); prev = cur; cur = c.get() }
  cur
}
// absorb codegen / SessionMemo model fits so the measured pass is
// steady-state regardless of key order
keys.foreach { k =>
  try graft.SparkEntry.queries(k)(spark, sfDir).write.format("noop").mode("overwrite").save()
  catch { case e: Throwable => println(s"SHUFFLE $k WARM-ERROR ${e.getMessage.take(60)}") }
  spark.catalog.clearCache()
}
keys.foreach { k =>
  spark.catalog.clearCache()
  val w0 = settled(wr); val r0 = settled(rd)
  val df = graft.SparkEntry.queries(k)(spark, sfDir)
  val wBuild = settled(wr) - w0
  df.write.format("noop").mode("overwrite").save()
  val wRun = settled(wr) - w0 - wBuild
  val rTot = settled(rd) - r0
  println(s"SHUFFLE $k build=$wBuild run=$wRun totalWrite=${wBuild + wRun} totalRead=$rTot")
}
}
sys.exit(0)
