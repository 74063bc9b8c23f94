// ANN economics forensic: the IVF-PQ claims (SCALE.md, LlmOps ann_*
// keys) measured at 200k vectors — 100× the bench fixture's embedding
// table. The claim under test: brute-force exact search reads the whole
// float corpus per query batch, while the IVF-PQ index reads nprobe/nCells
// of a 16×-compressed code table (64 float dims = 256 B vs 16 B of PQ
// codes — ADVICE r18 fix; BASELINE/README/SCALE state the same 16×) —
// and the recall cost of that economy is
// bounded. Deterministic synthetic corpus (16 latent clusters + hash
// noise, pure id arithmetic, no rand()); the index is built ONCE through
// the library-facing trainer (graft.operators.IvfPqIndex.fit — the same
// path the oracled ann_* keys train through) and queries run 3× timed.
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 16g \
//     --conf spark.sql.shuffle.partitions=32 --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --jars target/scala-2.13/sd2_drp_experimentgenspark_2.13-0.1.0.jar \
//     -I tools/annbench.scala < /dev/null
{
spark.sparkContext.setLogLevel("ERROR")
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

val N = 200000L
val DIM = 64
val PROBES = 100
// nprobe is a per-call parameter since the r20 sweep (1,2,4,8,16 below)

// Planted-neighbor corpus: 40k FAMILIES of 5 vectors each (f = id div 5)
// inside 16 latent clusters (f % 16). Per-dim structure: cluster center
// (spread ~7) + family character (spread ~6, the scale PQ's 16 codes per
// 4-dim subspace can resolve) + per-id noise (~1e-3, far below it). A
// probe's true top-3 are its 4 family siblings — recoverable by the
// index. Two earlier designs measured recall 0 BY CONSTRUCTION and are
// kept as cautionary notes: noise-only neighbors sit below the
// quantization floor, and a small-modulus character hash ((f*41+d*29)%83)
// is PERIODIC in f, planting ~30 exact family clones per probe at 200k —
// the character hash must be aperiodic over the family range (prime
// modulus 104729 > 40k families; 2654435761 is the Knuth multiplier
// already used by the engine's sampling hash).
val vecs = spark.range(N).select(col("id").as("vec_id"), expr(
  s"""transform(sequence(0, ${DIM - 1}), d -> cast(
     |  cast(((id div 5) % 16) * 7 + d * 13 as double) / 16.0d
     |  + cast(((id div 5) * 2654435761 + d * 40503) % 104729 as double) / 104729.0d * 6.0d
     |  + cast((id * 31 + d * 17) % 97 as double) / 97000.0d
     |as float))""".stripMargin).as("embedding"))
  .cache()
vecs.write.format("noop").mode("overwrite").save()

val t0 = System.nanoTime()
val model = graft.operators.IvfPqIndex.fit(vecs, nCells = 16)
val fitS = (System.nanoTime() - t0) / 1e9
val t1 = System.nanoTime()
val corpus = model.encode(vecs).cache()
corpus.write.format("noop").mode("overwrite").save()
val encodeS = (System.nanoTime() - t1) / 1e9
println(f"ANNBENCH fit=$fitS%.2f s encode=$encodeS%.2f s (one-time index build, $N vectors)")

val probes = vecs.filter(col("vec_id") < PROBES)
  .collect().map(r => (r.getLong(0),
    r.getSeq[Float](1).map(f => math.floor(f.toDouble * 1e6 + 0.5).toLong).toArray))

def timed(name: String)(f: => Long): Long = {
  var rows = f // warm
  val ts = (1 to 3).map { _ =>
    val s0 = System.nanoTime(); rows = f; (System.nanoTime() - s0) / 1e9
  }
  println(f"ANNBENCH $name%-12s med=${ts.sorted.apply(1)}%.2f s runs=${ts.map(t => f"$t%.2f").mkString(",")} result_rows=$rows")
  rows
}

// ---- brute force: every probe scores the ENTIRE float corpus ----
import vecs.sparkSession.implicits._
val probeDf = probes.toSeq.toDF("a_id", "qv")
val w = Window.partitionBy("a_id").orderBy(col("d2"), col("b_id"))
def brute = vecs.crossJoin(broadcast(probeDf))
  .filter(col("vec_id") =!= col("a_id"))
  .select(col("a_id"), col("vec_id").as("b_id"), expr(
    // exact integer squared L2 in the model's x1e6 quantized space
    """aggregate(zip_with(embedding, qv,
      |  (e, q) -> (cast(floor(cast(e as double) * 1000000.0d + 0.5d) as bigint) - q)
      |          * (cast(floor(cast(e as double) * 1000000.0d + 0.5d) as bigint) - q)),
      |  cast(0 as bigint), (acc, v) -> acc + v)""".stripMargin).as("d2"))
  .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
  .select("a_id", "b_id", "rnk")

// ---- IVF-PQ: driver routes probes to nprobe cells, ADC scores only
// those cells' 64-bit codes (2/16ths of a 16x-compressed table) ----
val subDim = DIM / model.codebook.length
val nCodes = model.codebook(0).length
def distTable(qv: Array[Long]): Seq[Long] =
  for (sub <- model.codebook.indices; c <- 0 until nCodes) yield {
    val cv = model.codebook(sub)(c)
    var d2 = 0L; var i = 0
    while (i < cv.length) { val df0 = qv(sub * subDim + i) - cv(i); d2 += df0 * df0; i += 1 }
    d2
  }
def routeCells(qv: Array[Long], nprobe: Int): Seq[Int] =
  model.cells.indices.map { c =>
    var d2 = 0L; var j = 0
    while (j < DIM) { val df0 = qv(j) - model.cells(c)(j); d2 += df0 * df0; j += 1 }
    (d2, c)
  }.sorted.take(nprobe).map(_._2)
val wA = Window.partitionBy("a_id").orderBy(col("adc2"), col("b_id"))
def ivfpq(nprobe: Int, k: Int = 3) = {
  val routed = probes.toSeq.flatMap { case (aId, qv) =>
    val dt = distTable(qv); routeCells(qv, nprobe).map(c => (aId, c, dt))
  }.toDF("a_id", "c_id", "dt")
  broadcast(routed)
    .join(corpus, expr("c_id = cluster AND a_id <> vec_id"))
    .select(col("a_id"), col("vec_id").as("b_id"), expr(
      s"""aggregate(sequence(0, ${model.codebook.length - 1}), cast(0 as bigint),
         | (acc, sub) -> acc + element_at(dt, sub * $nCodes + cast(element_at(codes, sub + 1) as int) + 1))""".stripMargin)
      .as("adc2"))
    .withColumn("rnk", row_number().over(wA)).filter(col("rnk") <= k)
    .select("a_id", "b_id", "rnk")
}

timed("brute_exact") { brute.count() }
// recall@3: fraction of brute-force true top-3 the index also returns
val bSet = brute.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

// ---- operating curve (VERDICT r19 item 3): recall/wall vs nprobe ----
// nprobe = the cell-routing knob; the curve locates the knee where
// more probed cells stop buying recall faster than they cost wall.
for (np <- Seq(1, 2, 4, 8, 16)) {
  val q = ivfpq(np)
  timed(f"ivfpq_np$np%-2d") { q.count() }
  val iSet = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  println(f"ANNBENCH nprobe=$np%-2d recall@3=${(bSet & iSet).size.toDouble / bSet.size}%.3f " +
    s"scanned=$np/${model.cells.length} cells, codes (16 B/vec) vs floats (256 B/vec)")
}

// ---- refinement curve: exact re-rank of the top-R ADC candidates ----
// The nprobe sweep measures recall FLAT at 0.707 (routing already finds
// the right cells; ADC quantization error is what misorders the top-3),
// so the recall lever is refinement, not more cells: keep the top-R by
// ADC, re-score ONLY those R rows/probe against the float vectors
// (R x 256 B per probe, still ~corpus/1000 reads), exact top-3.
def refined(np: Int, r: Int) = {
  val cand = broadcast(ivfpq(np, r).select("a_id", "b_id"))
  cand.join(vecs, col("b_id") === col("vec_id"))
    .join(broadcast(probeDf.withColumnRenamed("a_id", "p_id")),
      col("a_id") === col("p_id"))
    .select(col("a_id"), col("b_id"), expr(
      """aggregate(zip_with(embedding, qv,
        |  (e, q) -> (cast(floor(cast(e as double) * 1000000.0d + 0.5d) as bigint) - q)
        |          * (cast(floor(cast(e as double) * 1000000.0d + 0.5d) as bigint) - q)),
        |  cast(0 as bigint), (acc, v) -> acc + v)""".stripMargin).as("d2"))
    .withColumn("rnk", row_number().over(w))
    .filter(col("rnk") <= 3).select("a_id", "b_id", "rnk")
}
for (r <- Seq(8, 32)) {
  val q = refined(2, r)
  timed(f"refine_r$r%-3d") { q.count() }
  val rSet = q.collect().map(rr => (rr.getLong(0), rr.getLong(1))).toSet
  println(f"ANNBENCH nprobe=2 rerank=$r%-3d recall@3=${(bSet & rSet).size.toDouble / bSet.size}%.3f " +
    s"(exact re-score of $r cands/probe = $r x 256 B reads/probe)")
}
}
sys.exit(0)
