package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.etl.Checkpoints.CutOps
import graft.functions.DotProduct

/** IVFPQ index as a BUILD / SERVE split — the compressed persisted
  * layout of the dense family, completing the trilogy next to
  * [[AnnIndex]] (IVF-flat: full vectors in the posting lists) and the
  * x97 query that gates the composed serve cross-engine. A 100 TB ANN
  * deployment does not store 64 doubles per vector: it stores the
  * coarse cell (from [[AnnIndex]]'s trained codebook) plus [[Sub]]
  * byte-sized PQ codes, and serves queries from per-query asymmetric-
  * distance tables over ONLY the probed cells' code rows — the layout
  * every production vector index (FAISS-style IVFADC) actually ships.
  *
  * Stored tables ([[write]]): `coarse` (≤ [[AnnIndex.K]] rows),
  * `cells` (vec_id → coarse cell), `book0..book3` (8-row PQ codebooks
  * per subspace), `codes` (vec_id → [[Sub]] code ids — the compressed
  * corpus; full-precision vectors never touch the serve path).
  *
  * All kernels are the gated x18/x58/x95/x97 chains verbatim: hash-
  * spread seeds + exact-decimal Lloyd means (bit-identical codebooks
  * cross-engine), squared-L2 argmin encoding tie-broken on c_id, probe
  * ranking and ADC ranking tie-broken on id. `DedupSim.x58/x95/x97`
  * compose [[subspace]]/[[build]]/[[serve]] inline against their
  * DuckDB oracles, so the persisted index inherits the oracle gates
  * without a second oracle (the AnnIndex/SparseIndex pattern);
  * PqIndexSpec proves write→read→serve ≡ inline plus the maintenance
  * contracts.
  *
  * Maintenance is complete in-family and mirrors the other three
  * persisted indexes: [[append]] encodes a disjoint shard against the
  * FROZEN coarse + PQ codebooks (assignment/encoding are per-row, so
  * append is exactly the frozen-codebook encode of the new rows —
  * codebooks drift only at the next offline rebuild, the standard IVF
  * trade), and [[delete]] retracts vectors by keyed anti-join (exact
  * by the same row-locality; a revision is delete + append).
  *
  * Scale: build is the two trainings (bounded codebooks, broadcast-
  * safe forever) + per-row encodes; serve cost per query is
  * nprobe/K of the corpus' CODE rows (4 small ints each, not 64
  * doubles) via one cluster-keyed join + 4 LUT lookups; append/delete
  * touch only the shard's rows.
  */
object PqIndex {

  /** 4 subspaces × 16 dims × 8-entry codebooks over 64-dim vectors. */
  val Sub = 4
  val Dims = 16
  val K = 8

  /** The IVFPQ index: trained coarse codebook, per-vector cell
    * assignments, per-subspace PQ codebooks, per-vector code rows. */
  final case class Index(coarse: DataFrame, cells: DataFrame,
      books: Seq[DataFrame], codes: DataFrame)

  /** (vec_id, v, vv) slice of subspace `i` from an (vec_id, emb, ...)
    * relation — the shared slicing contract of build, append and the
    * query-side LUTs. */
  def slice(e: DataFrame, i: Int): DataFrame =
    e.select(col("vec_id"),
      expr(s"slice(emb, ${Dims * i + 1}, $Dims)").as("v"))
      .withColumn("vv", DotProduct(col("v"), col("v")))

  /** Frozen-book encode of a slice relation: nearest code by exact
    * squared L2 (vv − 2·dot + cc through the DotProduct fold), ties on
    * c_id — per-row, zero shuffle past the 8-row broadcast. */
  def encode(es: DataFrame, book: DataFrame): DataFrame =
    es.crossJoin(broadcast(book))
      .withColumn("dist", col("vv") -
        lit(2.0) * DotProduct(col("v"), col("c_v")) + col("c_vv"))
      .groupBy(col("vec_id"))
      .agg(min_by(struct(col("v").as("v"), col("c_id").as("c_id"),
        col("dist").as("dist")),
        struct(col("dist"), col("c_id"))).as("b"))
      .select(col("vec_id"), col("b.v").as("v"),
        col("b.c_id").as("cluster"), col("b.dist").as("dist"))

  /** Train subspace `i`'s 8-entry codebook — hash-spread seeds refined
    * by ONE exact-decimal Lloyd step (x58's chain verbatim) — and
    * encode the corpus against it.
    * Returns (codes_i(vec_id, code_i, err_i), book(c_id, c_v, c_vv)). */
  def subspace(e: DataFrame, i: Int): (DataFrame, DataFrame) = {
    val es = slice(e, i).cut(false) // seeds + Lloyd assign + code assign
    val seeds = es
      .orderBy(((col("vec_id") % 2147483648L) * 2654435761L)
        % 1000000007L, col("vec_id"))
      .limit(K)
      .select(col("vec_id").as("c_id"), col("v").as("c_v"),
        col("vv").as("c_vv"))
    val cb1 = encode(es, seeds)
      .select(col("cluster"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("cluster"), col("dim"))
      .agg((sum(col("x").cast("decimal(18,6)")).cast("double") /
        count(lit(1)).cast("double")).as("coord"))
      .groupBy(col("cluster"))
      .agg(expr("transform(array_sort(collect_list(struct(dim, coord)" +
        ")), s -> s.coord)").as("c_v"))
      .select(col("cluster").as("c_id"), col("c_v"))
      .withColumn("c_vv", DotProduct(col("c_v"), col("c_v")))
      // ≤8 rows; cut so the trained-codebook subtree plans once per
      // consumer (x95/x97 read it twice: code assignment + query LUTs)
      .cut(false)
    (encode(es, cb1)
      .select(col("vec_id"), col("cluster").as(s"code$i"),
        col("dist").as(s"err$i")), cb1)
  }

  /** Build the full IVFPQ index over an [[AnnIndex.prep]]-shaped
    * relation (vec_id, emb, norm). */
  def build(e: DataFrame): Index = {
    val coarse = AnnIndex.train(e).cut(false) // assignment + every probe
    val cells = AnnIndex.assign(e, coarse).select("vec_id", "cluster")
    val subs = (0 until Sub).map(i => subspace(e, i))
    val codes = subs.zipWithIndex
      .map { case ((c, _), i) => c.select(col("vec_id"), col(s"code$i")) }
      .reduce((a, b) => a.join(b, Seq("vec_id")))
    Index(coarse, cells, subs.map(_._2), codes)
  }

  /** Serve top-`k` ADC neighbors for `queries`(q_id, emb, norm):
    * rank the `nprobe` nearest coarse cells per query (broadcast —
    * ≤ 16 rows), build the |q|×8 ADC lookup table per subspace
    * (joined UNHINTED — the query side grows with the corpus, x05's
    * rule), and score ONLY the probed cells' code rows by four LUT
    * lookups + a fixed-order sum. Self-matches excluded. Output
    * carries `n_scanned` — the exact per-query count of code rows
    * scored, the cost column the IVF-vs-flat trade is measured in. */
  def serve(queries: DataFrame, idx: Index,
      nprobe: Int = AnnIndex.Probes, k: Int = 10): DataFrame = {
    val probes = queries
      .select(col("q_id"), col("emb").as("q_emb"), col("norm")
        .as("q_norm"))
      .crossJoin(broadcast(idx.coarse))
      .withColumn("dist", lit(1.0) -
        DotProduct(col("q_emb"), col("c_emb")) /
          (col("q_norm") * col("c_norm")))
      .withColumn("rk", row_number().over(Window.partitionBy("q_id")
        .orderBy(col("dist").asc, col("c_id"))))
      .filter(col("rk") <= nprobe)
      .select(col("q_id"), col("c_id").as("cluster"))
    serveWithProbes(queries, idx, probes, k)
  }

  /** Refine-tail width promoted by x104's measured card (sf1): k'=50
    * lifts recall@10 81.3% → 92.1% (the nprobe=4 ceiling — k'=100
    * buys nothing more) and top-1 to 100% for 50 exact rows per
    * query, 1% of the ADC scan. */
  val RefineK = 50

  /** Two-stage serve — [[serve]]'s ADC pass plus the standard exact
    * REFINE tail (FAISS-style): the top-`refineK` ADC candidates are
    * re-ranked by exact squared L2 against the full-precision vectors
    * in `vecs` (vec_id, emb — the relation the codes were built from;
    * the index itself stays compressed), then cut to `k`. Cost on top
    * of [[serve]]: one keyed join of ≤ refineK·|q| candidate rows —
    * never a second corpus scan. x104's card prices the k' choice;
    * PqIndexSpec pins refine(corpus-wide k') ≡ exact brute force and
    * refined recall ≥ plain ADC recall. Output mirrors [[serve]] with
    * `l2` in place of `adc`. */
  def serveRefined(queries: DataFrame, idx: Index, vecs: DataFrame,
      refineK: Int = RefineK, nprobe: Int = AnnIndex.Probes,
      k: Int = 10): DataFrame = {
    val cand = serve(queries, idx, nprobe, math.max(refineK, k))
      .select(col("q_id"), col("vec_id"), col("n_scanned"))
    cand
      .join(vecs.select(col("vec_id"), col("emb")), "vec_id")
      .join(queries.select(col("q_id"), col("emb").as("qe")), "q_id")
      .withColumn("l2", DotProduct(col("emb"), col("emb")) -
        lit(2.0) * DotProduct(col("emb"), col("qe")) +
        DotProduct(col("qe"), col("qe")))
      .withColumn("rank", row_number().over(Window.partitionBy("q_id")
        .orderBy(col("l2"), col("vec_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "vec_id", "rank", "l2", "n_scanned")
  }

  /** The serve tail behind an EXPLICIT (q_id, cluster) probe
    * relation — [[serve]]'s fixed-nprobe ranking is one producer;
    * adaptive policies (x103's distance-ratio cut) are another. Same
    * LUT build, same probed-cells scan, same ADC ranking. */
  def serveWithProbes(queries: DataFrame, idx: Index,
      probes: DataFrame, k: Int = 10): DataFrame = {
    val luts = (0 until Sub).map { i =>
      queries.select(col("q_id"),
        expr(s"slice(emb, ${Dims * i + 1}, $Dims)").as("qv"))
        .withColumn("qvv", DotProduct(col("qv"), col("qv")))
        .crossJoin(broadcast(idx.books(i)))
        .select(col("q_id"), col("c_id").as(s"code$i"),
          (col("qvv") - lit(2.0) * DotProduct(col("qv"), col("c_v")) +
            col("c_vv")).as(s"d$i"))
    }
    val scan = idx.codes.join(idx.cells, Seq("vec_id"))
      .join(probes, Seq("cluster"))
      .filter(col("vec_id") =!= col("q_id"))
      .cut(false) // consumers: the scan census + the ADC ranking
    val nScanned = scan.groupBy("q_id")
      .agg(count(lit(1)).as("n_scanned"))
    (1 until Sub)
      .foldLeft(scan.join(luts(0), Seq("q_id", "code0")))((acc, i) =>
        acc.join(luts(i), Seq("q_id", s"code$i")))
      .withColumn("adc",
        (0 until Sub).map(i => col(s"d$i")).reduce(_ + _))
      .withColumn("rank", row_number().over(Window.partitionBy("q_id")
        .orderBy(col("adc"), col("vec_id"))).cast("long"))
      .filter(col("rank") <= k)
      .join(nScanned, Seq("q_id"))
      .select("q_id", "vec_id", "rank", "adc", "n_scanned")
  }

  /** Fold a disjoint shard in WITHOUT retraining: assignment against
    * the frozen coarse codebook + encoding against the frozen PQ
    * codebooks — per-row operations, so the result is exactly the
    * frozen-codebook encode of the new rows (PqIndexSpec pins base-row
    * stability and delta exactness). Precondition (asserted): the
    * shard's vec_ids are disjoint from the indexed corpus — the
    * family-wide ingest contract; a revision is [[delete]] + append. */
  def append(idx: Index, eNew: DataFrame): Index = {
    // the check reads `codes` (same vec_id set as `cells` by
    // construction) so a codes-only consumer never forces the coarse
    // training/assignment subtree just to assert disjointness
    val clash = idx.codes.select("vec_id")
      .join(eNew.select("vec_id").distinct(), "vec_id")
      .limit(1).count()
    require(clash == 0L,
      "PqIndex.append: shard vec_ids overlap the indexed corpus — " +
        "append is defined for disjoint shards (revise = delete + append)")
    val (cellsNew, codesNew) = encodeShard(idx, eNew)
    Index(idx.coarse, idx.cells.unionByName(cellsNew), idx.books,
      idx.codes.unionByName(codesNew))
  }

  /** Frozen-codebook (cells, codes) encode of a shard — the per-row
    * kernel [[append]] folds in and [[graft.etl.PqSegments]] persists
    * as an O(delta) segment. */
  def encodeShard(idx: Index, eNew: DataFrame)
      : (DataFrame, DataFrame) = {
    val cellsNew = AnnIndex.assign(eNew, idx.coarse)
      .select("vec_id", "cluster")
    val codesNew = (0 until Sub)
      .map(i => encode(slice(eNew, i), idx.books(i))
        .select(col("vec_id"), col("cluster").as(s"code$i")))
      .reduce((a, b) => a.join(b, Seq("vec_id")))
    (cellsNew, codesNew)
  }

  /** Retract vectors — keyed anti-joins on `cells` and `codes`, exact
    * by row-locality under the frozen codebooks (the same argument as
    * [[AnnIndex.delete]]; serve over the deleted index ≡ serve over a
    * frozen-codebook encode of the remaining corpus). Deleting an
    * absent id is a no-op. */
  def delete(idx: Index, vecIds: DataFrame): Index = {
    val del = vecIds.select("vec_id").distinct()
    Index(idx.coarse,
      idx.cells.join(del, Seq("vec_id"), "left_anti"),
      idx.books,
      idx.codes.join(del, Seq("vec_id"), "left_anti"))
  }

  /** Persist the 3 + [[Sub]] index tables under `dir`. */
  def write(idx: Index, dir: String): Unit =
    graft.sources.Sources.writeOrdered(
      Seq("coarse" -> idx.coarse, "cells" -> idx.cells,
        "codes" -> idx.codes) ++
        (0 until Sub).map(i => s"book$i" -> idx.books(i)), dir)

  /** Load a persisted index. */
  def read(s: SparkSession, dir: String): Index =
    Index(SegmentOps.readKnown(s, s"$dir/coarse"),
      SegmentOps.readKnown(s, s"$dir/cells"),
      (0 until Sub).map(i => SegmentOps.readKnown(s, s"$dir/book$i")),
      SegmentOps.readKnown(s, s"$dir/codes"))
}
