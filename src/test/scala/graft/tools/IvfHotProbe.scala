package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.pipeline.Similarity

/**
 * Degenerate-corpus rehearsal for the r5 IVF hot-cell SPLIT at the
 * PRODUCTION cap (1024): sf0.1 has no cell anywhere near the cap
 * (`ivf_max_cell` 148), so this probe constructs the failure the split
 * exists for — one broad cluster of `HotN` deterministic jittered copies of
 * a single base vector, all landing in one quantizer cell (the
 * boilerplate-embedding shape: at 100 TB some template's embedding family
 * IS a constant fraction of the corpus).
 *
 * Measures, on the same augmented corpus:
 *   1. the pre-r5 sorted-SLICE behavior (over-cap members removed from the
 *      inverted list entirely) — recall@5 for queries drawn from inside the
 *      hot cluster, vs brute force;
 *   2. the shipping SPLIT behavior (`Similarity.ivfTopK`) — same recall;
 *   3. `ivf_max_cell` vs `ivf_max_subcell` (does one split level bring the
 *      probed list back under the cap?), and both walls.
 *
 * The slice variant is reconstructed inline below (the shipping code no
 * longer contains it): window rank per cell, `rn <= cap` kept, probes join
 * on bare `cell` — exactly the r4 shape.
 */
object IvfHotProbe {

  /** r4-shaped IVF: sorted-slice cell cap, no split (for the A/B only). */
  private def ivfTopKSliced(emb: DataFrame, nQueries: Long, k: Int,
      nCells: Int = 16, nProbe: Int = 4, cellCap: Int = 1024): DataFrame = {
    val cent = emb.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cell"), col("embedding").as("centroid"))
    val assigned = Similarity.assignCells(emb, cent)
    val wCap = Window.partitionBy("cell").orderBy("vec_id")
    val capped = assigned.withColumn("rn", row_number().over(wCap))
      .filter(col("rn") <= cellCap).select("cell", "vec_id")
    val wCell = Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cell").asc)
    val probes = emb.filter(col("vec_id") >= QueryBase)
      .select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(cent))
      .withColumn("ccos", expr(Similarity.cosineSql("embedding", "centroid")))
      .withColumn("r", row_number().over(wCell))
      .filter(col("r") <= nProbe)
      .select(col("vec_id").as("query_id"), col("cell"))
    val candIds = probes.join(capped, Seq("cell"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .distinct()
    rerank(candIds, emb, k)
  }

  private def rerank(candIds: DataFrame, emb: DataFrame, k: Int): DataFrame = {
    val payload = emb.select(col("vec_id"), col("embedding"))
    val cand = candIds
      .join(payload.select(col("vec_id").as("query_id"), col("embedding").as("qv")), Seq("query_id"))
      .join(payload.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv")), Seq("neighbor_id"))
    val scored = cand.withColumn("cos", expr(Similarity.cosineSql("qv", "cv")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
  }

  val QueryBase = 900000L

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.spark.GraftFunctions.register(spark)
    import spark.implicits._

    val base = Similarity.embeddings(spark, sfDir)
    val baseRows = base.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).toArray))
    val dim = baseRows.head._2.length
    val hotBase = baseRows.find(_._1 == 500L).get._2

    // deterministic broad cluster around vector 500: HotN jittered copies
    // (jitter large enough to flip split-plane bits — cosine to the base
    // stays ~0.99 but the family is NOT bit-identical, which is what makes
    // a split meaningful; an all-identical family is the width-exhaustion
    // guard case, not the split case)
    val HotN = if (args.length > 1) args(1).toInt else 4000
    def jit(i: Int, d: Int): Float = {
      var h = (i.toLong * 6364136223846793005L + d.toLong * 1442695040888963407L)
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
      ((h & 0xffff).toFloat / 65536.0f - 0.5f) * 0.25f
    }
    val hot = (0 until HotN).map { i =>
      (100000L + i, Array.tabulate(dim)(d => hotBase(d) + jit(i, d)))
    }
    // 20 queries drawn from INSIDE the hot cluster (fresh jitter stream):
    // their true top-5 neighbors are other hot members — exactly the rows a
    // slice would have dropped
    val queries = (0 until 20).map { i =>
      (QueryBase + i, Array.tabulate(dim)(d => hotBase(d) + jit(777000 + i, d)))
    }
    val corpus = (baseRows.toSeq ++ hot ++ queries)
      .toDF("vec_id", "embedding")
      .repartition(64).persist()
    corpus.count()

    val maxCell = Similarity.ivfMaxCell(corpus)
    val maxSub = Similarity.ivfMaxSubcell(corpus)
    println(s"corpus=${corpus.count()} hotN=$HotN ivf_max_cell=$maxCell ivf_max_subcell=$maxSub cap=${Similarity.IvfCellCap}")

    def pairs(df: DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag wall=${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // brute-force truth for the 20 hot queries
    val q = corpus.filter(col("vec_id") >= QueryBase)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val wq = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    val exact = timed("brute") { pairs(
      q.join(c, col("query_id") =!= col("neighbor_id"))
        .withColumn("cos", expr(Similarity.cosineSql("qv", "cv")))
        .withColumn("rank", row_number().over(wq))
        .filter(col("rank") <= 5)
        .select("query_id", "neighbor_id")) }

    // A: pre-r5 slice behavior at the production cap
    val sliced = timed("slice") { pairs(ivfTopKSliced(corpus, 20, 5)) }
    // B: shipping split behavior — same probes (queries are corpus members
    // with vec_id >= QueryBase, so run ivfTopK's body via the slice probe
    // shape but with the split lists)
    val split = timed("split") { pairs(ivfTopKSplitLike(corpus, 5)) }
    val split2 = timed("split+1bit") { pairs(ivfTopKSplitLike(corpus, 5, targetDiv = 2)) }
    val split3 = timed("split+2bit") { pairs(ivfTopKSplitLike(corpus, 5, targetDiv = 4)) }

    val rSlice = exact.intersect(sliced).size.toDouble / exact.size
    val rSplit = exact.intersect(split).size.toDouble / exact.size
    val rSplit2 = exact.intersect(split2).size.toDouble / exact.size
    val rSplit3 = exact.intersect(split3).size.toDouble / exact.size
    println(f"recall@5 hot-cluster queries: slice=$rSlice%.3f split=$rSplit%.3f split+1bit=$rSplit2%.3f split+2bit=$rSplit3%.3f")
    println(s"slice drops ${math.max(0, maxCell - Similarity.IvfCellCap)} of $maxCell hot-cell members from search entirely")

    // Scenario 2 — WIDTH EXHAUSTION: an identical-vector family (exact
    // boilerplate dups) shares every split-plane bit, so no bit width can
    // separate it; the (cell, sub) guard must bind, and the split-failure
    // flag makes every query that PROBES the family's cell probe all its
    // subs (without the flag, a query whose own sub differs by >=2 bits
    // missed the family entirely under 1-bit multiprobe — the first cut
    // of this probe measured exactly that). Guard binding itself is then
    // harmless: every guard-dropped candidate is an exact duplicate of a
    // kept one, so top-k COSINES are unaffected for every cell-probing
    // query (only the id tie-break among identical vectors changes).
    // Queries that never rank the family's cell into their nProbe list
    // are the standard IVF coarse-quantizer approximation (the same
    // reason headline recall@5 reads 0.89) — reported separately.
    val ident = (0 until HotN).map(i => (200000L + i, hotBase))
    val corpus2 = (baseRows.toSeq ++ ident ++ queries)
      .toDF("vec_id", "embedding").repartition(64).persist()
    corpus2.count()
    val maxCell2 = Similarity.ivfMaxCell(corpus2)
    val maxSub2 = Similarity.ivfMaxSubcell(corpus2)
    println(s"identical-family corpus: ivf_max_cell=$maxCell2 ivf_max_subcell=$maxSub2 (guard ${if (maxSub2 > Similarity.IvfCellCap) "BINDS" else "non-binding"})")
    def cosSet(df: DataFrame, emb: DataFrame) = {
      // (query_id, cosine-rounded) multiset — id-agnostic truth under ties
      val payload = emb.select(col("vec_id"), col("embedding"))
      df.join(payload.select(col("vec_id").as("query_id"), col("embedding").as("qv")), Seq("query_id"))
        .join(payload.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv")), Seq("neighbor_id"))
        .withColumn("c", round(expr(Similarity.cosineSql("qv", "cv")), 9))
        .groupBy("query_id", "c").count()
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    }
    val exact2 = q.join(corpus2.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv")),
        col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", expr(Similarity.cosineSql("qv", "cv")))
      .withColumn("rank", row_number().over(wq))
      .filter(col("rank") <= 5).select("query_id", "neighbor_id")
    val split2b = ivfTopKSplitLike(corpus2, 5, targetDiv = 2)
      .select("query_id", "neighbor_id")
    val exactCos = cosSet(exact2, corpus2)
    val splitCos = cosSet(split2b, corpus2)
    // which queries rank the family's cell into their nProbe=4 list?
    val famCell = Similarity.assignCells(
      corpus2.filter(col("vec_id") === 200000L),
      corpus2.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cell"), col("embedding").as("centroid")))
      .collect()(0).getLong(1)
    val wP = Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cell").asc)
    val probing = corpus2.filter(col("vec_id") >= QueryBase)
      .crossJoin(broadcast(corpus2.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cell"), col("embedding").as("centroid"))))
      .withColumn("ccos", expr(Similarity.cosineSql("embedding", "centroid")))
      .withColumn("r", row_number().over(wP))
      .filter(col("r") <= 4 && col("cell") === famCell)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val perQ = (0 until 20).map { i =>
      val qid = QueryBase + i
      (qid, probing(qid),
        exactCos.filter(_._1 == qid) == splitCos.filter(_._1 == qid))
    }
    val probingOk = perQ.filter(_._2)
    println(s"identical-family: ${probingOk.size}/20 queries probe the family cell; " +
      s"cosine-level recall among them: ${if (probingOk.forall(_._3)) "1.000 (exact)" else s"MISMATCH ${probingOk.filterNot(_._3).map(_._1)}"}")
    val misses = perQ.filterNot(_._2)
    println(s"quantizer-missed queries (family cell outside their nProbe=4 list — the standard IVF approximation, independent of split/guard): ${misses.map(_._1).mkString(", ")}")
    spark.stop()
  }

  /** Shipping split semantics (Similarity.ivfTopK body) with the probe set
    * `vec_id >= QueryBase` instead of `< nQueries`. */
  private def ivfTopKSplitLike(emb: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 4,
      cellCap: Int = Similarity.IvfCellCap,
      maxSubBits: Int = Similarity.IvfMaxSubBits,
      targetDiv: Int = 1): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cent = emb.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cell"), col("embedding").as("centroid"))
    val centRows = cent.orderBy("cell").collect()
    val qz = graft.spark.IvfQuantizer.build(
      centRows.map(_.getLong(0)),
      centRows.map(_.getSeq[Float](1).toArray))
    val assigned = emb.select(col("vec_id"),
      graft.spark.GraftFunctions.ivf_assign_bc(spark, "ivf-quantizer-probe", qz,
        col("embedding")).as("cell"),
      graft.spark.GraftFunctions.lsh_bits(col("embedding"),
        Similarity.IvfSplitPlaneStart, maxSubBits).as("sub_full"))
    // targetDiv=1 reproduces the first-cut rule (expected sub-cell ≤ cap);
    // targetDiv=2 is the ADOPTED shipping rule (≤ cap/2 — one margin bit,
    // measured +0.07 hot-query recall below); targetDiv=4 showed no
    // further recall gain
    val bitsChain = (0 until maxSubBits).foldRight(lit(maxSubBits)) { (b, rest) =>
      val bound = if (b == 0) cellCap.toLong
                  else cellCap.toLong * (1L << b) / targetDiv
      when(col("cnt") <= bound, lit(b)).otherwise(rest)
    }
    val cellBits = assigned.groupBy("cell").agg(count(lit(1)).as("cnt"))
      .select(col("cell"), bitsChain.as("sub_bits"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
      .toDF("cell", "sub_bits")
    val members = assigned.join(broadcast(cellBits), Seq("cell"))
      .withColumn("sub", col("sub_full")
        .bitwiseAND(expr("shiftleft(1L, sub_bits) - 1L")))
    // split-failure flag (mirrors Similarity.ivfTopK): queries probing a
    // cell whose hottest sub still exceeds the cap probe ALL its subs
    val cellMeta = {
      val over = members.groupBy("cell", "sub").agg(count(lit(1)).as("n"))
        .groupBy("cell").agg(max("n").as("max_sub"))
        .select(col("cell"), (col("max_sub") > cellCap).as("probe_all"))
        .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
      cellBits.collect()
        .map(r => (r.getLong(0), r.getInt(1), over.getOrElse(r.getLong(0), false)))
        .toSeq.toDF("cell", "sub_bits", "probe_all")
    }
    val wCap = Window.partitionBy("cell", "sub").orderBy("vec_id")
    val capped = members.withColumn("rn", row_number().over(wCap))
      .filter(col("rn") <= cellCap).select("cell", "sub", "vec_id")
    val wCell = Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cell").asc)
    val probeFlips = col("qsub") +: (0 until maxSubBits)
      .map(b => col("qsub").bitwiseXOR(lit(1L << b)))
    val probes = emb.filter(col("vec_id") >= QueryBase)
      .select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(cent))
      .withColumn("ccos", expr(Similarity.cosineSql("embedding", "centroid")))
      .withColumn("r", row_number().over(wCell))
      .filter(col("r") <= nProbe)
      .select(col("vec_id").as("query_id"), col("cell"),
        graft.spark.GraftFunctions.lsh_bits(col("embedding"),
          Similarity.IvfSplitPlaneStart, maxSubBits).as("qsub_full"))
      .join(broadcast(cellMeta), Seq("cell"))
      .withColumn("qsub", col("qsub_full")
        .bitwiseAND(expr("shiftleft(1L, sub_bits) - 1L")))
      .withColumn("sub", explode(
        when(col("probe_all"),
          expr("sequence(0L, shiftleft(1L, sub_bits) - 1L)"))
          .otherwise(slice(array(probeFlips: _*), lit(1), col("sub_bits") + 1))))
      .select(col("query_id"), col("cell"), col("sub"))
    val candIds = probes.join(capped, Seq("cell", "sub"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .distinct()
    rerank(candIds, emb, k)
  }
}
