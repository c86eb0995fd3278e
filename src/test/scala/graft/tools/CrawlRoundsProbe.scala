package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.crawl.Frontier

/** Dev probe: the Bench multi-round crawl section in isolation. */
object CrawlRoundsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .repartition(spark.sparkContext.defaultParallelism * 2)
    val seed = li.select(
      explode(expr("sequence(0, 1)")).as("m"),
      col("l_suppkey"), col("l_partkey"), col("l_orderkey"), col("l_linenumber"))
      .select(
        concat(lit("https://host-"), pmod(col("l_suppkey") + col("m") * 7, lit(200)),
          lit(".example/part/"), col("l_partkey"), lit("/v"), col("m")).as("url"),
        concat(lit("host-"), pmod(col("l_suppkey") + col("m") * 7, lit(200)),
          lit(".example")).as("host"),
        col("l_linenumber").cast("int").as("priority"),
        (col("l_orderkey") * 64 + col("l_linenumber") * 8 + col("m")).cast("long").as("seq"))
    val disc: DataFrame => Option[DataFrame] = batch =>
      Some(batch.select(concat(col("url"), lit("x")).as("url"), col("host"),
        col("priority"), (col("seq") + 1000000000L).as("seq")))
    val root = s"/dev/shm/graft-bench/crawlprobe-${System.currentTimeMillis}"
    val metrics = Frontier.crawl(spark, root, seed, rounds = 6,
      budgetPerHost = 2000, bloomBits = 1L << 24, discover = disc)
    metrics.foreach(m => println(
      s"round=${m("round")} wall_ms=${m("wall_ms")} sched=${m("scheduled")} seen=${m("seen_total")} next=${m("frontier_next")}"))
    spark.stop()
  }
}
