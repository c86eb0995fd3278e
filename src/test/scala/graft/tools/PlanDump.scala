package graft.tools
import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans of the headline queries (dev tool feeding
  * PLANS.md — the 100 TB plan audit). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val names = Seq("q_links", "q_dedup_minhash", "q_ann_lsh", "q_ann_ivf",
      "q_crawl_schedule", "q_text_analysis", "q_dom_mutate_validate",
      "q_embed_neardup", "q_dedup_ngram_jaccard")
    names.foreach { n =>
      println(s"===== $n =====")
      val df = graft.SparkEntry.queries(n)(spark, sf)
      // operator tree only (first section of formatted explain)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
      println(formatted)
    }
    spark.stop()
  }
}
