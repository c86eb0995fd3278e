package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev probe: max band-key population vs BandCap at a given SF (r5 ask #2:
  * the widened simhash band space must put the cap back to non-binding). */
object BandProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.pipeline.TextPipeline
    val corpus = TextPipeline.withSyntheticDups(TextPipeline.documents(spark, sfDir))
    println(s"simhash_max_band=${TextPipeline.simhashMaxBand(corpus)}")
    println(s"minhash_max_band=${TextPipeline.minhashMaxBand(corpus)}")
    println(s"band_cap=${TextPipeline.BandCap}")
    spark.stop()
  }
}
