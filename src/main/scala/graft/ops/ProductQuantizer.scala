package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.ArrayMath

/** Product quantization (Jégou, Douze & Schmid 2011, "Product Quantization
  * for Nearest Neighbor Search") — the memory side of billion-scale ANN:
  * split each d-dim vector into `m` subspaces, k-means each subspace
  * independently, store every vector as `m` small codes (here 4 × 4-bit) instead
  * of d floats — a 64× compression at the shipped config — and rank
  * candidates by codebook-lookup distances. Pairs with the IVF cell
  * routing already in `ops/Vectors` (IVF chooses WHICH lists to scan, PQ
  * makes scanning them cheap).
  *
  * The differentiator vs the float Lloyd path (`Vectors.ivfRefinedVerdict`,
  * which can only pin INVARIANTS because float means are aggregation-order-
  * dependent): training here runs on EXACT scaled integers — components
  * quantized once via the house floor(x·1e6 + 0.5) contract, distances by
  * the native long `Σ(a−b)²` kernel, centroid means by floor division —
  * so the whole trajectory (seeds → assignment → refined codebook → codes)
  * is deterministic under any partitioning AND value-replayable bit-for-bit
  * by an external SQL engine. No verdict needed: the oracle hash-compares
  * the codebook and every vector's codes directly.
  *
  * Scale shape: the codebook is config-sized (m·k rows) and broadcast;
  * assignment is one narrow pass per vector over m·k candidate rows with a
  * (vector, subspace)-keyed k-row argmin — shuffle O(rows·m), never
  * O(rows·k). Seeding collects exactly k ids (bounded, like the band-sample
  * and BPE-argmax collects). Refinement is one (subspace, code, dim)-keyed
  * integer aggregate.
  */
object ProductQuantizer {

  /** Exact micro-unit quantization — the same floor(x·1e6 + 0.5) contract
    * as `Vectors.round6`/`centroidOutliers`, applied per component.
    */
  def scaledMicro(v: Column): Column = scaledVec(v)

  private def scaledVec(v: Column): Column =
    transform(v, x => floor(x.cast("double") * lit(1e6) + lit(0.5)).cast("long"))

  /** Floor division on longs via the non-negative pmod. CROSS-ENGINE TRAP
    * (cost one oracle round): DuckDB's integer `//` TRUNCATES toward zero
    * on negatives (-17 // 2 = -8), it does not floor — so the oracle must
    * subtract the same `(a % b + b) % b` pmod before dividing rather than
    * use bare `//` on possibly-negative centroid sums.
    */
  private def floorDiv(s: Column, n: Column): Column =
    ((s - pmod(s, n)) / n).cast("long")

  /** `(id, s, sub)` — every vector's scaled subvector per subspace. The
    * scaled array is built once per row and sliced m times inside one
    * projection (multi-reference blocks CollapseProject from inlining the
    * per-element transform m×).
    */
  private def subspaces(emb: DataFrame, idCol: String, vecCol: String,
                        m: Int, width: Int): DataFrame =
    emb.select(col(idCol).cast("long").as("id"), scaledVec(col(vecCol)).as("sv"))
      .select(col("id"), explode(array((0 until m).map(s =>
        struct(lit(s.toLong).as("s"),
          slice(col("sv"), s * width + 1, width).as("sub"))): _*)).as("x"))
      .select(col("id"), col("x.s").as("s"), col("x.sub").as("sub"))

  /** Nearest-centroid assignment: broadcast the (m·k)-row codebook, exact
    * long distances, deterministic (dist, code) argmin per (vector,
    * subspace).
    */
  private def assign(sub: DataFrame, codebook: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("id"), col("s"))
      .orderBy(col("dist"), col("code"))
    sub.join(broadcast(codebook), Seq("s"))
      .withColumn("dist", ArrayMath.sqDistLongNative(col("sub"), col("cvec")))
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("id"), col("s"), col("code"), col("sub"), col("dist"))
  }

  /** Train the codebook: k deterministic seeds (ordered by md5(id) — the
    * engine-portable shuffle-proof sampling used throughout), one exact-
    * integer Lloyd round, empty cells keep their seed centroid. Returns
    * `(s, code, cvec)` with cvec in scaled micro-units.
    */
  def train(emb: DataFrame, m: Int = 4, k: Int = 16, dims: Int = 64,
            idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(m >= 1 && k >= 1, "m and k must be >= 1")
    require(dims % m == 0, s"m=$m must divide dims=$dims")
    val sub = subspaces(emb, idCol, vecCol, m, dims / m)
    // bounded collect: exactly k seed ids
    val seedIds = emb.select(col(idCol).cast("long").as("id"))
      .orderBy(md5(col("id").cast("string").cast("binary")), col("id"))
      .limit(k).collect().map(_.getLong(0))
    require(seedIds.length == k, s"need >= $k vectors to seed $k codes")
    import emb.sparkSession.implicits._
    val codes = seedIds.toSeq.zipWithIndex
      .map { case (id, c) => (id, c.toLong) }.toDF("id", "code")
    val init = sub.join(broadcast(codes), Seq("id"))
      .select(col("s"), col("code"), col("sub").as("cvec"))
    val refined = assign(sub, init)
      .select(col("s"), col("code"), posexplode(col("sub")).as(Seq("pos", "v")))
      .groupBy(col("s"), col("code"), col("pos"))
      .agg(sum(col("v")).as("sm"), count(lit(1)).as("n"))
      .select(col("s"), col("code"), col("pos"),
        floorDiv(col("sm"), col("n")).as("cv"))
      .groupBy(col("s"), col("code"))
      .agg(array_sort(collect_list(struct(col("pos"), col("cv")))).as("pm"))
      .select(col("s"), col("code"),
        transform(col("pm"), x => x.getField("cv")).as("cvec"))
    init.as("i").join(refined.as("r"), Seq("s", "code"), "left_outer")
      .select(col("s"), col("code"),
        coalesce(col("r.cvec"), col("i.cvec")).as("cvec"))
  }

  /** PQ retrieval by asymmetric distance computation (ADC, Jégou et al.
    * 2011 §IV): each query precomputes an m×k lookup table of EXACT
    * subspace distances to the codebook (one broadcast join, m·k rows per
    * query); every corpus vector is then scored from its m stored codes
    * alone — m table lookups and adds, the original vectors never read.
    * That is the entire economics of PQ at 10⁹ vectors: the scan touches
    * 4-bit codes, not 256-byte floats. Top-k per query by (adc_dist,
    * neighbor_id) — all integers, fully value-replayable.
    *
    * Queries must be config-capped (the `cosineTopK` broadcast
    * discipline): the scored frame is O(corpus·m·|queries|).
    */
  def adcTopK(corpusCodes: DataFrame, codebook: DataFrame, queries: DataFrame,
              k: Int, m: Int = 4, dims: Int = 64,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(dims % m == 0, s"m=$m must divide dims=$dims")
    val lut = subspaces(queries, idCol, vecCol, m, dims / m)
      .join(broadcast(codebook), Seq("s"))
      .select(col("id").as("qid"), col("s"), col("code"),
        ArrayMath.sqDistLongNative(col("sub"), col("cvec")).as("d"))
    val cc = corpusCodes.select(col("id"),
        posexplode(col("codes")).as(Seq("pos", "code")))
      .select(col("id"), col("pos").cast("long").as("s"), col("code"))
    val adc = cc.join(broadcast(lut), Seq("s", "code"))
      .filter(col("qid") =!= col("id"))
      .groupBy(col("qid").as("query_id"), col("id").as("neighbor_id"))
      .agg(sum(col("d")).cast("long").as("adc_dist"))
    Relational.topKPerGroup(adc, Seq(col("query_id")),
      Seq(col("adc_dist").asc, col("neighbor_id").asc), k, rankCol = "rank")
  }

  /** IVF-PQ — the composition that actually runs at 10⁹ vectors (FAISS's
    * default index family): IVF cell routing prunes WHICH lists a query
    * scans (`Vectors.cellAssignments`, nprobe cells of ~corpus/maxCentroids
    * each), PQ's ADC makes scanning them cheap (m table-adds per candidate
    * against 4-bit codes, original vectors never read). Candidates per
    * query are bounded by nprobe · cell size instead of the corpus, and
    * the scored frame by candidates · m — both config-governed. Ranking
    * is fully value-replayable: float cosines decide only the routing
    * (the same deterministic assignment every IVF path here uses), all
    * scoring is exact integers.
    */
  def ivfpqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                m: Int = 4, kCodes: Int = 16, dims: Int = 64,
                centroidEvery: Int = 50, nprobe: Int = 2,
                maxCentroids: Int = 128,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cb = train(corpus, m, kCodes, dims, idCol, vecCol)
    val codes = encode(corpus, cb, m, dims, idCol, vecCol)
    val cents = Vectors.ivfCentroids(corpus, centroidEvery, maxCentroids, 0,
      idCol, vecCol)
    val lists = Vectors.cellAssignments(corpus, cents, 1, idCol, vecCol)
    val probes = Vectors.cellAssignments(queries, cents, nprobe, idCol, vecCol)
      .select(col("cell"), col("id").as("qid"))
    val lut = subspaces(queries, idCol, vecCol, m, dims / m)
      .join(broadcast(cb), Seq("s"))
      .select(col("id").as("qid"), col("s"), col("code"),
        ArrayMath.sqDistLongNative(col("sub"), col("cvec")).as("d"))
    // every corpus id lives in exactly ONE cell (keep = 1), so the probe
    // join emits each (query, candidate) pair at most once — no distinct
    val cand = probes.join(lists, Seq("cell"))
      .filter(col("qid") =!= col("id"))
      .select(col("qid"), col("id"))
    val cc = codes.select(col("id"),
        posexplode(col("codes")).as(Seq("pos", "code")))
      .select(col("id"), col("pos").cast("long").as("s"), col("code"))
    val adc = cand.join(cc, Seq("id"))
      .join(broadcast(lut), Seq("qid", "s", "code"))
      .groupBy(col("qid").as("query_id"), col("id").as("neighbor_id"))
      .agg(sum(col("d")).cast("long").as("adc_dist"))
    Relational.topKPerGroup(adc, Seq(col("query_id")),
      Seq(col("adc_dist").asc, col("neighbor_id").asc), k, rankCol = "rank")
  }

  /** Encode every vector against a trained codebook: `(id, codes, err)`
    * where `codes` is the m per-subspace code ids in subspace order and
    * `err` the total exact squared reconstruction error in micro²-units.
    */
  def encode(emb: DataFrame, codebook: DataFrame,
             m: Int = 4, dims: Int = 64,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(dims % m == 0, s"m=$m must divide dims=$dims")
    assign(subspaces(emb, idCol, vecCol, m, dims / m), codebook)
      .groupBy(col("id"))
      .agg(array_sort(collect_list(struct(col("s"), col("code")))).as("sc"),
        sum(col("dist")).cast("long").as("err"))
      .select(col("id"),
        transform(col("sc"), x => x.getField("code")).as("codes"),
        col("err"))
  }
}
