package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.crawl.Frontier

/** r6 probe: where q_crawl_schedule's wall goes — stagewise noop timing of
  * the synthetic frontier, dedup, seen filter, schedule phases. */
object CrawlSchedProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    def time(name: String)(mk: => DataFrame): Unit = {
      mk.write.format("noop").mode("overwrite").save()
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"$name%-34s $t%.3f s")
    }

    // mirror SparkEntry.synthFrontier
    def synthFrontier(): (DataFrame, DataFrame) = {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
        .repartition(spark.sparkContext.defaultParallelism * 2,
          col("l_orderkey"), col("l_linenumber"))
      val hostIdx = pmod(col("l_suppkey"), lit(50))
      val scheme = when(pmod(hostIdx, lit(3)) === 1, lit("http://")).otherwise(lit("https://"))
      val hostCol = concat(lit("host-"), hostIdx, lit(".example"),
        when(pmod(hostIdx, lit(7)) === 2, lit(":8081")).otherwise(lit("")))
      val f = li.select(
        concat(scheme, hostCol, lit("/part/"), col("l_partkey")).as("url"),
        hostCol.as("host"),
        col("l_linenumber").cast("int").as("priority"),
        (col("l_orderkey") * 8 + col("l_linenumber")).cast("long").as("seq"),
        col("l_quantity"))
      val seen = f.filter(col("l_quantity") < 5).select("url").distinct()
      (f.drop("l_quantity"), seen)
    }

    val (frontier, seen) = synthFrontier()
    time("frontier scan only")(frontier)
    time("seen distinct only")(seen)
    time("dedupCandidates")(Frontier.dedupCandidates(frontier))
    time("dedup + filterUnseen") {
      Frontier.filterUnseen(Frontier.dedupCandidates(frontier), seen)
    }
    time("dedup + unseen + schedule") {
      Frontier.schedule(
        Frontier.filterUnseen(Frontier.dedupCandidates(frontier), seen), 3)
    }
    time("full q_crawl_schedule") {
      graft.SparkEntry.queries("q_crawl_schedule")(spark, dir)
    }
    spark.stop()
  }
}
