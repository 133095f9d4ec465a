package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale guards for the sign-LSH ANN index (x05b/x10): the plane count
  * adapts with log2(corpus) so candidate pairs stay ~linear, and
  * over-full buckets are dropped (skew cap). */
class AnnScalingSpec extends SparkSpec {
  import spark.implicits._

  test("plane count grows with log2(n): bucket space doubles per doubling") {
    assert(DedupSim.adaptivePlanes(1L) == 8) // floor
    assert(DedupSim.adaptivePlanes(1000L) == 11)
    assert(DedupSim.adaptivePlanes(2000L) == 12)
    assert(DedupSim.adaptivePlanes(1L << 40) == 42)
    // expected candidates n²/2^p: doubling n adds one plane → the
    // estimate scales ×2 (linear), never ×4 (quadratic)
    for (n <- Seq(1000L, 10000L, 100000L, 10000000L)) {
      val est = math.pow(n.toDouble, 2) /
        math.pow(2.0, DedupSim.adaptivePlanes(n))
      val est2 = math.pow(2.0 * n, 2) /
        math.pow(2.0, DedupSim.adaptivePlanes(2 * n))
      assert(math.abs(est2 / est - 2.0) < 1e-9)
    }
  }

  private def pairs(vecs: DataFrame): Long =
    vecs.select(col("vec_id").as("a"), col("bucket"))
      .join(vecs.select(col("vec_id").as("b"), col("bucket")), "bucket")
      .filter(col("a") < col("b"))
      .count()

  test("candidate pairs stay ~linear when the corpus doubles") {
    val base = Tables.fanout(Tables.embeddings(spark, sf))
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val n = base.count()
    // doubled corpus: cosine-preserving scaled copies land in the same
    // bucket as their original (worst realistic growth case)
    val doubled = base.unionByName(
      base.select((col("vec_id") + 500000L).as("vec_id"),
        expr("transform(emb, x -> x * 1.001)").as("emb")))
    val c1 = pairs(DedupSim.signBucketsCapped(base, "emb",
      DedupSim.adaptivePlanes(n)))
    val c2 = pairs(DedupSim.signBucketsCapped(doubled, "emb",
      DedupSim.adaptivePlanes(2 * n)))
    // quadratic growth at fixed buckets would be ~4×; with one added
    // plane the growth is ~2× plus the n planted twin pairs
    assert(c2 <= 3 * c1 + 2 * n, s"c1=$c1 c2=$c2 n=$n")
    assert(c2 > 0)
  }

  test("IVF probe search recovers a meaningful share of brute-force top-k") {
    def pairsOf(name: String) =
      graft.SparkEntry.queries(name)(spark, sf)
        .select("q_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairsOf("x05_knn_cosine")
    val ivf = pairsOf("x18_knn_ivf")
    assert(brute.nonEmpty && ivf.nonEmpty)
    // both queries are deterministic, so recall is a constant of the
    // dataset. The UNTRAINED codebook (first-16-by-id centroids, the
    // r5 design) measured 0.52 at sf0.001 with nprobe=4/16; training
    // (hash-spread seeds + 2 exact Lloyd steps) lifts it to 0.64 on
    // the same near-uniform vectors. The floor sits strictly above
    // the untrained number: a regression that silently drops the
    // training (or breaks cell assignment) fails here.
    val untrainedRecall = 0.52
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall > untrainedRecall,
      s"recall=$recall — trained codebook must beat the fixed-16 " +
        s"baseline ($untrainedRecall)")
  }

  test("IVFPQ scans a strict subset of the flat ADC scan at bounded recall cost") {
    // x95 (flat ADC) scores ALL code rows per query: |corpus|-1 each.
    // x97 (IVFPQ) scores only the nprobe=4-of-16 probed cells' rows —
    // the n_scanned column the card carries must sit well under the
    // flat count, and the quantization+pruning recall must not fall
    // off a cliff vs flat ADC (pruning can only remove candidates).
    val n = Tables.fanout(Tables.embeddings(spark, sf)).count()
    val ivfpq = graft.SparkEntry.queries("x97_ivfpq_serve")(spark, sf)
      .select("q_id", "n_hits", "n_scanned").collect()
    assert(ivfpq.nonEmpty)
    val scanned = ivfpq.map(_.getLong(2))
    val flatPerQuery = n - 1
    // every query must scan < half the flat cost; the mean should be
    // near nprobe/K = 1/4 (allow slack for uneven trained cells)
    assert(scanned.max < flatPerQuery / 2,
      s"max scanned ${scanned.max} vs flat $flatPerQuery")
    val meanFrac = scanned.sum.toDouble / scanned.length / flatPerQuery
    assert(meanFrac < 0.45, s"mean scan fraction $meanFrac")
    // recall floor: flat ADC at sf0.001 measures ~0.55; pruning costs
    // some hits but a working composition stays above a third of the
    // truth list on average (an empty/broken scan join fails here)
    val flat = graft.SparkEntry.queries("x95_pq_adc_serve")(spark, sf)
      .select("q_id", "n_hits").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val meanIvfpqHits = ivfpq.map(_.getLong(1)).sum.toDouble / ivfpq.length
    val meanFlatHits = flat.values.sum.toDouble / flat.size
    assert(meanIvfpqHits >= meanFlatHits * 0.5,
      s"IVFPQ hits $meanIvfpqHits collapsed vs flat $meanFlatHits")
  }

  test("over-full buckets are dropped by the skew cap") {
    val hot = (1 to 120).map(i => (i.toLong, Array.fill(64)(1.0)))
    val cold = (200 to 240).map { i =>
      (i.toLong, Array.tabulate(64)(j =>
        math.sin(i * 64 + j))) // deterministic spread
    }
    val df = (hot ++ cold).toDF("vec_id", "emb")
      .withColumn("emb", expr("transform(emb, x -> CAST(x AS DOUBLE))"))
    val vecs = DedupSim.signBucketsCapped(df, "emb", 10)
    // the 120-identical cluster exceeds BucketCap=100 → dropped wholesale
    assert(vecs.filter(col("vec_id") <= 120).count() == 0)
    // spread vectors survive with bounded buckets
    assert(vecs.count() > 0)
    val maxBucket = vecs.groupBy("bucket").count()
      .agg(max("count")).head().getLong(0)
    assert(maxBucket <= DedupSim.BucketCap)
  }
}
