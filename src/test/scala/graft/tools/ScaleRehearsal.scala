package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.{Similarity, TextPipeline}

/**
 * r4 ask #6: one larger-scale datapoint for the three heaviest pipeline
 * queries (minhash, simhash, embedding near-dup). No sf1 parquet exists in
 * the sandbox, so the corpus is a DETERMINISTIC 10× expansion of sf0.1:
 *
 *  - documents: each doc replicated ×10 with a per-replica token suffix
 *    ("wXm") — replica vocabularies are DISJOINT, so no cross-replica
 *    shingle/band collisions and the expansion scales cleanly (a plain copy
 *    would create 10-way near-dup clusters and measure pair verification,
 *    not scaling).
 *  - embeddings: each vector replicated ×10 with a pseudo-random per-(i,m)
 *    component perturbation (cosine-distinct replicas; pure scaling would
 *    leave cosine unchanged).
 *
 * Each query then runs through the SAME dup-augmented entry shape the bench
 * and oracle gates use. Reports wall seconds + the cap-audit metrics at both
 * 1× and 10× — the evidence that band/bucket populations and wall grow
 * ~linearly (caps non-binding, fixed-width shuffles), not quadratically.
 */
object ScaleRehearsal {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // replica m keeps m=0 byte-identical to the source table (so mult=1 IS
    // the bench corpus) and gives m>0 a disjoint vocabulary per replica
    def docs10(mult: Int): DataFrame =
      TextPipeline.documents(spark, sfDir)
        .select(explode(expr(s"sequence(0, ${mult - 1})")).as("m"),
          col("doc_id"), col("text"))
        .select((col("doc_id") + col("m") * 10000000L).as("doc_id"),
          when(col("m") === 0, col("text")).otherwise(concat_ws(" ",
            expr("transform(split(text, ' '), w -> concat(w, 'x', m))")))
            .as("text"))

    // m=0 identity; m>0 replicas are FRESH xxhash64-derived pseudo-random
    // vectors matching the base distribution (unit-ish, component std 1/8 =
    // uniform(-0.2165, 0.2165)). Perturbing the source instead was tried
    // twice and both variants biased the LSH buckets: a per-m common offset
    // direction collapsed them outright (max bucket 1362 vs the real 47),
    // and even the per-(vec_id,i,m) lattice formula had only 7 distinct
    // offset PATTERNS (norm ~0.8 against unit vectors → max bucket 2126).
    // Fresh replicas keep bucket occupancy honest, and each replica with
    // vec_id % 10 == 0 still receives its planted near-dup inside
    // embeddingNearDupPairs (withSyntheticNearDups), so the found-pair
    // count scales linearly with the corpus too.
    def emb10(mult: Int): DataFrame =
      Similarity.embeddings(spark, sfDir)
        .select(explode(expr(s"sequence(0, ${mult - 1})")).as("m"),
          col("vec_id"), col("embedding"))
        .select((col("vec_id") + col("m") * 10000000L).as("vec_id"),
          when(col("m") === 0, col("embedding")).otherwise(
            expr("""transform(embedding, (x, i) ->
                     cast((pmod(xxhash64(vec_id, m, i), 1000003)
                           / 1000003.0D - 0.5D) * 0.433D as float))"""))
            .as("embedding"))

    // storage-side corpus (the bench shape: queries read parquet, synthesis
    // is not in the timed path) + min-of-2 (first run carries JIT/codegen)
    def time(fn: => DataFrame): (Double, Long) = {
      var n = 0L
      val w = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        n = fn.count()
        (System.nanoTime() - t0) / 1e9
      }.min
      (w, n)
    }

    for (mult <- Seq(1, 10)) {
      val base = s"/dev/shm/graft-bench/scale$mult"
      docs10(mult).repartition(64).write.mode("overwrite").parquet(s"$base/documents")
      emb10(mult).repartition(64).write.mode("overwrite").parquet(s"$base/embeddings")
      val corpus = TextPipeline.withSyntheticDups(spark.read.parquet(s"$base/documents"))
      val e = spark.read.parquet(s"$base/embeddings")
      val nDocs = corpus.count(); val nEmb = e.count()
      val (wMin, nMin) = time(TextPipeline.minhashPairs(corpus, minJ = 0.6))
      val (wSim, nSim) = time(TextPipeline.simhashPairs(corpus, maxHam = 6))
      val (wNd, nNd) = time(Similarity.embeddingNearDupPairs(e, minCos = 0.9))
      val maxBandMin = TextPipeline.minhashMaxBand(corpus)
      val maxBandSim = TextPipeline.simhashMaxBand(corpus)
      val maxBucketNd = Similarity.neardupMaxBucket(e)
      println(f"[scale] mult=$mult docs=$nDocs emb=$nEmb " +
        f"minhash=$wMin%.2fs($nMin pairs) simhash=$wSim%.2fs($nSim pairs) " +
        f"neardup=$wNd%.2fs($nNd pairs) " +
        f"minhash_max_band=$maxBandMin simhash_max_band=$maxBandSim " +
        f"neardup_max_bucket=$maxBucketNd band_cap=${TextPipeline.BandCap}")
    }
    spark.stop()
  }
}
