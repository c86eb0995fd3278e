package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.TextPipeline

/** Dev probe: stage-by-stage timing of the minhash dedup path at sf0.1. */
object DedupProf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val corpus = TextPipeline.withSyntheticDups(TextPipeline.documents(spark, sfDir))
    time("corpus count")(corpus.count())
    time("tokens only") {
      corpus.withColumn("toks", expr(TextPipeline.tokensSql("text")))
        .select(sum(size(col("toks")))).collect()
    }
    time("word hashes") {
      corpus.withColumn("toks", expr(TextPipeline.tokensSql("text")))
        .withColumn("th", expr(s"transform(toks, w -> ${TextPipeline.wordHashSql("w")})"))
        .select(sum(size(col("th")))).collect()
    }
    time("shingles") {
      TextPipeline.withShingles(corpus).select(sum(size(col("shingles")))).collect()
    }
    time("shingles+sig") {
      TextPipeline.withShingles(corpus)
        .withColumn("sig", expr(TextPipeline.minhashSigSql("shingles")))
        .select(sum(size(col("sig")))).collect()
    }
    time("full minhashPairs")(TextPipeline.minhashPairs(corpus, 0.6).count())
    time("full minhashPairs 2nd")(TextPipeline.minhashPairs(corpus, 0.6).count())
    spark.stop()
  }
}
