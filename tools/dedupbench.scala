// Dedup-at-scale forensic: the banded-minhash family measured at 1M
// documents — 200× the sf0.1 documents table. The claims under test
// (SCALE.md "Similarity & dedup at corpus scale"): signature build is
// one combinable aggregation over the shingle explode (linear in
// grams), and the band equi-join keeps CANDIDATE pairs linear in the
// corpus — never the 5·10¹¹ all-pairs a naive quadratic dedup would
// form. Deterministic synthetic corpus (word streams from id
// arithmetic): 5% of docs are planted near-copies of their predecessor
// (one word of 30 changed → shingle-Jaccard ≈ 0.87, above the 0.7
// fuzzy threshold), the rest are unrelated. The word stream MUST be a
// non-algebraic function of (id, w) — murmur3 hash(id, w) here. Two
// rejected designs, kept as cautionary notes: (id*37 + w*11) % 50000
// is periodic in id (period 50k — every doc got ~20 exact clones, the
// small-modulus trap annbench.scala also documents), and ANY stream
// linear in w with a doc-independent step shift-aligns across docs
// (word(id, w) = word(id', w+k) whenever (id-id')·A ≡ k·step — one
// fixed id-difference per shift k, which planted ~4M accidental
// near-dup pairs at 1M docs). Runs the PRODUCTION path —
// graft.queries.TextSim.{gramTable, bandSignatures,
// minhashNearDupPairs} — not a replica.
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 24g \
//     --conf spark.sql.shuffle.partitions=32 --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --jars target/scala-2.13/sd2_drp_experimentgenspark_2.13-0.1.0.jar \
//     -I tools/dedupbench.scala < /dev/null
{
spark.sparkContext.setLogLevel("ERROR")
import org.apache.spark.sql.functions._

val N = 1000000L
val WORDS = 30
// base(id): docs with id % 20 == 1 copy doc id-1's word stream except
// the last word — a planted near-dup pair per 20 docs (50k pairs)
val docs = spark.range(N).select(col("id").as("doc_id"), expr(
  s"""concat_ws(' ', transform(sequence(0, ${WORDS - 1}), w ->
     |  concat('w', cast(
     |    case when id % 20 = 1 and w < ${WORDS - 1}
     |         then pmod(hash(id - 1, w), 1000003)
     |         else pmod(hash(id, w), 1000003) end as string))))""".stripMargin)
  .as("text"))

def timed[T](name: String)(f: => T): T = {
  val t0 = System.nanoTime()
  val r = f
  println(f"DEDUPBENCH $name%-18s wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
  r
}

// 1. signature build (the persisted-index artifact dedup_incremental
//    and the streaming NearDupFilter both warm-start from)
val sigs = timed("signature_build") {
  val bands = graft.queries.TextSim.bandSignatures(
    graft.queries.TextSim.gramTable(spark, docs))
  val n = bands.count()
  println(s"DEDUPBENCH   band rows=$n (5 per doc)")
  bands
}

// 2. end-to-end near-dup pairs (band join + size guard + exact-Jaccard
//    re-rank) — the dedup_fuzzy production path
val pairs = timed("near_dup_pairs") {
  val p = graft.queries.TextSim.minhashNearDupPairs(spark, docs)
    .filter(col("doc_a") =!= col("doc_b"))
  val found = p.count()
  val planted = p.filter(expr("doc_b = doc_a + 1 AND doc_b % 20 = 1")).count()
  println(s"DEDUPBENCH   pairs found=$found planted-recovered=$planted/50000" +
    f" (all-pairs avoided: ${N * (N - 1) / 2}%,d)")
  p
}
}
sys.exit(0)
