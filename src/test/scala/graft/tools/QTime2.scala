package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev probe: time a named-query subset at sf0.1 (mutation/serialization). */
object QTime2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = if (args.nonEmpty) args.toSeq
      else Seq("q_dom_mutate_class", "q_dom_mutate_validate", "q_links", "q_dom_text")
    for (q <- qs) {
      val fn = graft.SparkEntry.queries(q)
      fn(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"$q%-24s $t%.2f s")
    }
    spark.stop()
  }
}
