// Streaming-throughput forensic: the streaming twins (NearDupFilter,
// HeavyHitters) ship with correctness/parity gates (StreamingSpec) but
// their throughput claims were assertion-only. This measures both
// stateful operators end-to-end through real micro-batches at 1M rows —
// an order of magnitude past the spec fixtures — on BOTH state-store
// providers (HDFS in-memory and RocksDB, the spillable production
// backend StreamingSpec pins). Deterministic synthetic data (id
// arithmetic, no rand()).
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 16g \
//     --conf spark.sql.shuffle.partitions=32 --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --jars target/scala-2.13/sd2_drp_experimentgenspark_2.13-0.1.0.jar \
//     -I tools/streambench.scala < /dev/null
{
spark.sparkContext.setLogLevel("ERROR")
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import spark.implicits._
implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

val N = 1000000
val BATCHES = sys.env.getOrElse("SPARK_GRAFT_BATCHES", "10").toInt
val per = N / BATCHES

// ~200k docs x 5 bands; bucket values collide at ~10% (every 10th doc
// shares its predecessor-group's buckets) so the state map AND the
// candidate path both do real work
def bandRows(lo: Int, hi: Int): Seq[(Long, Int, Long, Long)] =
  (lo until hi).map { i =>
    val doc = i / 5L; val bi = i % 5
    val grp = doc - doc % 10 // 10-doc collision groups
    (doc, bi, grp * 31L + bi, grp * 17L + bi * 7L)
  }

// zipf-ish heavy-hitter traffic: half the items from 5 hot values, half
// spread over 100k cold values, keyed by 8 monitors
def hhRows(lo: Int, hi: Int): Seq[(String, String)] =
  (lo until hi).map { i =>
    val key = "m" + (i % 8)
    val item = if (i % 2 == 0) "hot" + (i % 5) else "cold" + (i % 100000)
    (key, item)
  }

def timeStream(name: String, provider: String)(mk: () => (Int => Unit, () => Unit)): Unit = {
  spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
  val (feed, close) = mk()
  val t0 = System.nanoTime()
  (0 until BATCHES).foreach(feed)
  val e = (System.nanoTime() - t0) / 1e9
  close()
  val prov = provider.split("\\.").last.replace("StateStoreProvider", "")
  println(f"STREAMBENCH $name%-14s provider=$prov%-8s wall=$e%.2f rows/s=${(N / e / 1000).round}k")
}

val HDFS = "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
val ROCKS = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

for (prov <- Seq(HDFS, ROCKS)) {
  timeStream("near_dup", prov) { () =>
    val ms = MemoryStream[(Long, Int, Long, Long)]
    val q = graft.streaming.NearDupFilter.candidates(ms.toDS())
      .writeStream.format("noop").outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ndf").toString)
      .start()
    (b => { ms.addData(bandRows(b * per, (b + 1) * per)); q.processAllAvailable() },
      () => q.stop())
  }
  timeStream("heavy_hitters", prov) { () =>
    val ms = MemoryStream[(String, String)]
    val q = graft.streaming.HeavyHitters.monitor(ms.toDS(), 10)
      .writeStream.format("noop").outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("hh").toString)
      .start()
    (b => { ms.addData(hhRows(b * per, (b + 1) * per)); q.processAllAvailable() },
      () => q.stop())
  }
}
}
sys.exit(0)
