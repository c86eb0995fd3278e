package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.TextPipeline

/**
 * r5 scale evidence for `TextPipeline.minhashPairsIncremental`: per-round
 * cost must stay ~proportional to the BATCH (plus a narrow fixed-width scan
 * of stored band keys), not to the accumulated history — that is the
 * operator's entire 100 TB claim vs re-running batch `minhashPairs` over
 * the growing corpus each crawl round.
 *
 * Synthesis (deterministic, no external data): round m is the sf0.1
 * documents table with every word suffixed "x<m>" — DISJOINT vocabulary per
 * round, so no accidental cross-round shingle collisions — except docs in
 * the id slice `doc_id % 50 == m % 50` (m > 0), which carry the PREVIOUS
 * round's suffix: an exact copy of round m-1's doc under a fresh doc_id.
 * Each round therefore must find its ~115 planted pairs against the STORED
 * signature table, the id slices are disjoint round-to-round so dup
 * clusters stay size 2 (pair count per round is CONSTANT — wall growth, if
 * any, is the operator's, not the workload's).
 *
 * Round inputs are materialized to parquet BEFORE timing, so the timed
 * region is exactly the operator: read stored tables, hash the new batch,
 * semi-prune + candidate join, verify, append signatures. The final line
 * times batch `minhashPairs` over the full accumulated corpus — what a
 * non-incremental pipeline would re-run every round.
 */
object IncDedupScale {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val rounds = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.spark.GraftFunctions.register(spark)

    val base = "/dev/shm/graft-inc-scale"
    val basePath = new org.apache.hadoop.fs.Path(base)
    val fs = basePath.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(basePath)) fs.delete(basePath, true)
    val sigDir = s"$base/sig"

    def roundDocs(m: Int): DataFrame =
      TextPipeline.documents(spark, sfDir)
        .withColumn("sfx",
          when(lit(m) > 0 && col("doc_id") % 50 === lit(m % 50), lit(m - 1))
            .otherwise(lit(m)))
        .select((col("doc_id") + lit(m.toLong) * 10000000L).as("doc_id"),
          concat_ws(" ",
            expr("transform(split(text, ' '), w -> concat(w, 'x', sfx))"))
            .as("text"))

    (0 until rounds).foreach(m => roundDocs(m).repartition(8)
      .write.mode("overwrite").parquet(s"$base/in/r$m"))

    println("round  wall_s  pairs  hist_docs  sig_mb")
    var hist = 0L
    val walls = Array.ofDim[Double](rounds)
    (0 until rounds).foreach { m =>
      val batch = spark.read.parquet(s"$base/in/r$m")
      val t0 = System.nanoTime()
      val n = TextPipeline.minhashPairsIncremental(batch, sigDir, minJ = 0.6)
        .count()
      walls(m) = (System.nanoTime() - t0) / 1e9
      hist += batch.count()
      val sigMb = fs.getContentSummary(new org.apache.hadoop.fs.Path(sigDir))
        .getLength / 1048576.0
      println(f"$m%5d  ${walls(m)}%6.2f  $n%5d  $hist%9d  $sigMb%6.1f")
    }
    val full = (0 until rounds).map(m => spark.read.parquet(s"$base/in/r$m"))
      .reduce(_ unionByName _)
    val t0 = System.nanoTime()
    val nb = TextPipeline.minhashPairs(full, minJ = 0.6).count()
    val batchWall = (System.nanoTime() - t0) / 1e9
    println(f"batch recompute over the full $hist%d-doc history: " +
      f"$batchWall%.2f s, $nb%d pairs")
    println(f"last-round incremental wall ${walls(rounds - 1)}%.2f s = " +
      f"${walls(rounds - 1) / batchWall * 100}%.0f%% of the recompute a " +
      "non-incremental pipeline would pay EVERY round at this history size")
    spark.stop()
  }
}
