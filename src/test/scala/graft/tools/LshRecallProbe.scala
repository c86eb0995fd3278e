package graft.tools

import org.apache.spark.sql.SparkSession
import graft.pipeline.Similarity

/** Dev probe: recall@5 + mean candidate count per (nTables, bitsPerTable)
  * LSH config vs brute force on sf0.1 embeddings, to pick the amplification
  * that clears recall ≥ 0.8 (VERDICT r2 ask #2) at bounded candidate cost. */
object LshRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Similarity.embeddings(spark, "/root/testdata/sf0.1").cache()
    emb.count()
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, 20, 5))
    for ((t, b) <- Seq((4, 4), (8, 3), (12, 3), (16, 3), (8, 2), (10, 3))) {
      val t0 = System.nanoTime()
      val got = pairs(Similarity.lshTopK(emb, 20, 5, nTables = t, bitsPerTable = b))
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"tables=$t%2d bits=$b recall5=${exact.intersect(got).size.toDouble / exact.size}%.3f wall=${secs}%.1fs")
    }
    spark.stop()
  }
}
