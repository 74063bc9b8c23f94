// Per-key ACTION/JOB count probe (VERDICT r16 item 4: action count is the
// builder-controllable exposure metric under driver-host contention — every
// job boundary is a scheduling window a loaded host can tax).
// Counts Spark jobs fired (a) while the query DataFrame is CONSTRUCTED
// (pinOnce materializations, model fits, boundary collects) and (b) while
// it runs once through a noop sink. clearCache between keys so pinned
// kernels are billed to the key that builds them, like the bench protocol.
//   SPARK_GRAFT_KEYS=a,b,c /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.sql.shuffle.partitions=32 --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --jars target/scala-2.13/sd2_drp_experimentgenspark_2.13-0.1.0.jar \
//     -I tools/actioncount.scala < /dev/null
{
spark.sparkContext.setLogLevel("ERROR")
val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
val keys = sys.env.get("SPARK_GRAFT_KEYS").map(_.split(",").toSeq)
  .getOrElse(graft.SparkEntry.queries.keys.toSeq.sorted)
val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
  override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
    jobs.incrementAndGet()
})
// absorb codegen/page-cache first touch so job counts are steady-state
keys.foreach { k =>
  try graft.SparkEntry.queries(k)(spark, sfDir).write.format("noop").mode("overwrite").save()
  catch { case e: Throwable => println(s"ACTIONS $k WARM-ERROR ${e.getMessage.take(60)}") }
  spark.catalog.clearCache()
}
keys.foreach { k =>
  spark.catalog.clearCache()
  val j0 = jobs.get()
  val df = graft.SparkEntry.queries(k)(spark, sfDir)
  val jBuild = jobs.get() - j0
  df.write.format("noop").mode("overwrite").save()
  val jRun = jobs.get() - j0 - jBuild
  println(s"ACTIONS $k build=$jBuild run=$jRun total=${jBuild + jRun}")
}
}
sys.exit(0)
