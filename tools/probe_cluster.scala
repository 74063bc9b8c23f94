// Probe: where does dedup_cluster's time go at sf0.1?
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.sql.session.timeZone=UTC \
//   --jars target/scala-2.13/sd2_drp_experimentgenspark_2.13-0.1.0.jar -I tools/probe_cluster.scala
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import java.util.concurrent.ConcurrentHashMap

val d = "/root/testdata/sf0.1"
spark.conf.set("spark.sql.session.timeZone", "UTC")

val jobStarts = new ConcurrentHashMap[Int, (Long, String)]()
@volatile var jobLog = List.empty[(Int, Long, String)]
spark.sparkContext.addSparkListener(new SparkListener {
  override def onJobStart(js: SparkListenerJobStart): Unit = {
    val desc = Option(js.properties).map(_.getProperty("spark.job.description", "")).getOrElse("")
    jobStarts.put(js.jobId, (System.nanoTime(), desc))
  }
  override def onJobEnd(je: SparkListenerJobEnd): Unit = {
    Option(jobStarts.remove(je.jobId)).foreach { case (t0, desc) =>
      jobLog = (je.jobId, (System.nanoTime() - t0) / 1000000L, desc) :: jobLog
    }
  }
})

def timed(name: String)(f: => Unit): Unit = {
  jobLog = Nil
  val t0 = System.nanoTime()
  f
  val sec = (System.nanoTime() - t0) / 1e9
  println(f"PROBE $name%-24s ${sec}%6.2f s  jobs=${jobLog.size}")
  jobLog.sortBy(_._1).foreach { case (id, ms, _) => println(f"  job $id%3d  ${ms}%6d ms") }
}

// cold: ngram pipeline alone
timed("dedup_ngram_jaccard") {
  graft.SparkEntry.queries("dedup_ngram_jaccard")(spark, d)
    .write.format("noop").mode("overwrite").save()
}
spark.catalog.clearCache()

// cold: full cluster query
timed("dedup_cluster_cold") {
  graft.SparkEntry.queries("dedup_cluster")(spark, d)
    .write.format("noop").mode("overwrite").save()
}
spark.catalog.clearCache()

// CC alone on a pre-materialized pair graph of the same shape
val jp = graft.SparkEntry.queries("dedup_ngram_jaccard")(spark, d)
  .select($"da".as("a"), $"db".as("b")).persist()
val nedges = jp.count()
println(s"PROBE edges=$nedges")
val participants = jp.select($"a".as("node")).union(jp.select($"b".as("node"))).distinct().persist()
println(s"PROBE participants=${participants.count()}")
timed("minLabel_alone") {
  val l = graft.operators.ConnectedComponents.minLabel(participants, jp, graphSizeHint = nedges)
  l.write.format("noop").mode("overwrite").save()
}
System.exit(0)
