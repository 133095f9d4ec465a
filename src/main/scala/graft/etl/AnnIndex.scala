package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.DotProduct

/** IVF-flat ANN index as a BUILD / SERVE split — the deploy shape of
  * the x18 query. A real 100 TB deployment does not retrain the coarse
  * codebook inside every query: the index is built once ([[train]] +
  * [[assign]]), persisted as two plain tables ([[write]]: `codebook`,
  * ≤ [[K]] rows; `assignments`, one row per vector with its cluster,
  * embedding and norm — the IVF posting lists), and queries are served
  * from the loaded tables ([[serve]]) with zero training work in the
  * query path. New vectors append WITHOUT retraining: [[assign]] with
  * the FROZEN codebook is the assignments-only update (the standard
  * IVF append contract — cell shapes drift only at the next offline
  * rebuild; AnnIndexSpec pins that frozen-codebook assignment is
  * stable for existing vectors and exact for appended ones).
  *
  * All kernels are the x18 family's, verbatim: hash-spread seeds +
  * exact-decimal Lloyd steps (bit-identical codebook under any
  * partitioning/engine), argmin assignment and probe ranking
  * tie-broken on id. DedupSim.x18 composes [[prep]]/[[train]]/
  * [[assign]]/[[serve]] inline against its DuckDB oracle, and
  * AnnIndexSpec proves write→read→serve ≡ the inline path — so the
  * persisted index inherits the oracle gate without a second oracle.
  *
  * Scale: the codebook never exceeds [[K]] rows (broadcast-safe
  * forever); build cost is [[Iters]] keyed (cluster, dim) mean shuffles
  * + one assignment pass; serve cost is one broadcast probe ranking +
  * one cluster-keyed candidate join over nprobe/K of the corpus. */
object AnnIndex {

  val K = 16
  val Probes = 4
  val Iters = 2

  /** (vec_id, emb double[], norm) from an embeddings table. */
  def prep(embTable: DataFrame): DataFrame =
    embTable
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
      .withColumn("norm", sqrt(DotProduct(col("emb"), col("emb"))))

  private def cdist(v: Column, n: Column): Column =
    lit(1.0) - DotProduct(v, col("c_emb")) / (n * col("c_norm"))

  /** Hash-spread seed codebook: K rows scattered evenly over the id
    * space by multiplicative ordering — no locality bias from ingest
    * order. */
  def seeds(e: DataFrame): DataFrame =
    e.orderBy(((col("vec_id") % 2147483648L) * 2654435761L)
        % 1000000007L, col("vec_id"))
      .limit(K)
      .select(col("vec_id").as("c_id"), col("emb").as("c_emb"),
        col("norm").as("c_norm"))

  /** One exact Lloyd step over `e`(vec_id, emb, norm) given centroids
    * (c_id, c_emb, c_norm): nearest-centroid assignment (broadcast +
    * min_by) then per-(cluster, dim) decimal-exact means reassembled
    * into centroid vectors with fresh norms. Deterministic under any
    * partitioning; empty cells drop out. */
  def lloydStep(e: DataFrame, cents: DataFrame): DataFrame = {
    val assigned = e.crossJoin(broadcast(cents))
      .withColumn("dist", cdist(col("emb"), col("norm")))
      .groupBy(col("vec_id"))
      .agg(min_by(struct(col("emb").as("emb"), col("c_id").as("c_id")),
        struct(col("dist"), col("c_id"))).as("b"))
      .select(col("b.emb").as("emb"), col("b.c_id").as("cluster"))
    assigned
      .select(col("cluster"), posexplode(col("emb")).as(Seq("dim", "v")))
      .groupBy(col("cluster"), col("dim"))
      .agg((sum(col("v").cast("decimal(18,6)")).cast("double") /
        count(lit(1)).cast("double")).as("coord"))
      .groupBy(col("cluster"))
      .agg(expr("transform(array_sort(collect_list(struct(dim, coord)))" +
        ", s -> s.coord)").as("c_emb"))
      .select(col("cluster").as("c_id"), col("c_emb"))
      .withColumn("c_norm", sqrt(DotProduct(col("c_emb"), col("c_emb"))))
  }

  /** Trained codebook: hash-spread seeds refined by [[Iters]] exact
    * Lloyd steps. */
  def train(e: DataFrame): DataFrame =
    (1 to Iters).foldLeft(seeds(e))((c, _) => lloydStep(e, c))

  /** Nearest-cell assignment of every vector against a FROZEN codebook
    * — the build-time posting lists AND the incremental append path
    * (new vectors get cells without touching the codebook). */
  def assign(e: DataFrame, cents: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("dist").asc, col("c_id"))
    e.crossJoin(broadcast(cents))
      .withColumn("dist", cdist(col("emb"), col("norm")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("emb"), col("norm"),
        col("c_id").as("cluster"))
  }

  /** Serve top-`k` cosine neighbors for `queries`(q_id, q_emb, q_norm)
    * from a codebook + assignments pair: rank the `nprobe` nearest
    * cells per query (broadcast — the codebook is ≤ K rows), then score
    * only those cells' vectors. Self-matches (vec_id = q_id) are
    * excluded, matching the corpus-probe contract of x18. */
  def serve(queries: DataFrame, cents: DataFrame, assigned: DataFrame,
      nprobe: Int = Probes, k: Int = 10): DataFrame = {
    val probed = queries.crossJoin(broadcast(cents))
      .withColumn("dist", cdist(col("q_emb"), col("q_norm")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("dist").asc,
          col("c_id"))))
      .filter(col("rk") <= nprobe)
      .select(col("q_id"), col("q_emb"), col("q_norm"),
        col("c_id").as("cluster"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    assigned.join(probed, Seq("cluster"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", DotProduct(col("emb"), col("q_emb")) /
        (col("norm") * col("q_norm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "vec_id", "cluster", "rank", "cos")
  }

  /** Remove vectors from the assignments table — the IVF delete path,
    * mirroring the append contract's frozen-codebook semantics: the
    * codebook is untouched (cell shapes drift only at the next offline
    * rebuild — the standard IVF maintenance trade), and because
    * assignment is per-vector against that frozen codebook, the
    * anti-join is EXACTLY assign(corpus ∖ deleted, codebook) — x96's
    * family symmetry with [[graft.etl.SparseIndex.delete]]. A REVISION
    * is delete + [[assign]] of the revised vector. Deleting an absent
    * id is a no-op. */
  def delete(assigned: DataFrame, vecIds: DataFrame): DataFrame =
    assigned.join(vecIds.select("vec_id").distinct(), Seq("vec_id"),
      "left_anti")

  /** Persist the index: `codebook` (≤ K rows) + `assignments` (the
    * posting lists, vector payload included so serve never rejoins the
    * source table). */
  def write(cents: DataFrame, assigned: DataFrame, dir: String): Unit =
    graft.sources.Sources.writeOrdered(
      Seq("codebook" -> cents, "assignments" -> assigned), dir)

  /** Load a persisted index: (codebook, assignments). */
  def read(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    (SegmentOps.readKnown(s, s"$dir/codebook"),
      SegmentOps.readKnown(s, s"$dir/assignments"))
}
