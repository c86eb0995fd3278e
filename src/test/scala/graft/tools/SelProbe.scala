package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: selection-only µs/page on the stored replicated hnbig table,
  * with per-run calibration, to separate host congestion from real cost. */
object SelProbe {
  def calib(): Double = {
    var x = 0x9E3779B97F4A7C15L; var ops = 0L
    val t0 = System.nanoTime(); var now = t0
    while (now - t0 < 150000000L) {
      var i = 0
      while (i < 1000000) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
      ops += 1000000L; now = System.nanoTime()
    }
    if (x == 42L) println("")
    ops / ((now - t0) / 1e3)
  }

  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.spark.GraftFunctions.register(s)
    val stored = "/dev/shm/graft-bench/hnbig"
    val docs = s.read.parquet(stored)
    val n = docs.count()
    println(s"PAGES=$n FILES=" + new java.io.File(stored).listFiles().count(_.getName.endsWith(".parquet")))
    import graft.spark.{GraftFunctions => F}
    def selJob() = docs
      .withColumn("athing", F.css_select(col("nodes"), "tr.athing:has(a[href][id])"))
      .withColumn("title_a", F.css_select_under(col("nodes"), col("athing"), ".title a.storylink"))
      .select(col("doc_id"),
        F.dom_attr_each(col("nodes"), col("title_a"), "href").as("hrefs"),
        F.dom_text_each(col("nodes"), col("title_a")).as("titles"))
    selJob().write.format("noop").mode("overwrite").save() // warmup
    for (i <- 1 to 4) {
      val c = calib()
      val t0 = System.nanoTime()
      selJob().write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"run$i calib=${c}%.0f wall=${secs}%.2fs us_per_page=${secs * 1e6 / n}%.1f")
    }
    // decode-only baseline: how much of the wall is parquet nested decode?
    val t0 = System.nanoTime()
    docs.select(col("doc_id"), size(col("nodes")).as("n")).write.format("noop").mode("overwrite").save()
    println(f"decode_only=${(System.nanoTime() - t0) / 1e9}%.2fs")
    s.stop()
  }
}
