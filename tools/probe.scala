// t1 smoke probe (the verify skill's step 2): run via
//   sbt package && /opt/spark/bin/spark-shell --master 'local[8]' \
//     --conf spark.ui.enabled=false --conf spark.sql.session.timeZone=UTC \
//     --jars target/scala-2.13/sd2_drp_experimentgenspark_2.13-0.1.0.jar \
//     -I tools/probe.scala < /dev/null
// Prints PROBE_ROWS (must be > 0, the driver's t1 contract) and the
// flagship's executed plan for PushedFilters / ReadSchema / broadcast
// inspection.
spark.sparkContext.setLogLevel("WARN")
val df = graft.SparkEntry.entry(spark)
val n = df.count()
println(s"PROBE_ROWS=$n")
assert(n > 0, "t1 contract: entry() must return rows on sf0.001")
println(df.queryExecution.executedPlan.toString.take(4000))
