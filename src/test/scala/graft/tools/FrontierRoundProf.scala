package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.crawl.Frontier

/** r6: exact replica of Bench.frontierRun (stored inputs, cached bloom,
  * AQE off, 64 partitions) with stage decomposition — the headline-metric
  * iteration loop. args: cpus [mult] */
object FrontierRoundProf {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.nonEmpty) args(0).toInt else 32
    val mult = if (args.length > 1) args(1).toInt else 16
    val dir = "/dev/shm/graft-frp"
    def session(n: Int): SparkSession = {
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      val s = SparkSession.builder().master(s"local[$n]")
        .appName(s"frp-$n")
        .config("spark.sql.shuffle.partitions", 64)
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.local.dir", "/dev/shm/graft-spark")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }
    val prep = session(cpus)
    val sfDir = "/root/testdata/sf0.1"
    val li = prep.read.parquet(s"$sfDir/lineitem.parquet")
      .repartition(prep.sparkContext.defaultParallelism * 2)
    val frontier0 = li.select(
        explode(expr(s"sequence(0, ${mult - 1})")).as("m"),
        col("l_suppkey"), col("l_partkey"), col("l_orderkey"), col("l_linenumber"))
      .select(
        concat(lit("https://host-"), pmod(col("l_suppkey") + col("m") * 7, lit(200)),
          lit(".example/part/"), col("l_partkey"), lit("/v"), col("m")).as("url"),
        concat(lit("host-"), pmod(col("l_suppkey") + col("m") * 7, lit(200)),
          lit(".example")).as("host"),
        col("l_linenumber").cast("int").as("priority"),
        (col("l_orderkey") * 64 + col("l_linenumber") * 8 + col("m")).cast("long").as("seq"))
    frontier0.write.mode("overwrite").parquet(s"$dir/frontier")
    frontier0.filter(pmod(xxhash64(col("url")), lit(8)) === 0)
      .select("url").distinct()
      .write.mode("overwrite").parquet(s"$dir/seen")
    val bloomBits = 1L << 24
    val bloom = Frontier.urlBloom(prep.read.parquet(s"$dir/seen"),
      Frontier.bloomExpectedItems(bloomBits), bloomBits)
    val n = prep.read.parquet(s"$dir/frontier").count()
    println(s"N_URLS=$n")
    prep.stop()

    val s = session(cpus)
    val frontier = s.read.parquet(s"$dir/frontier")
    val seen = s.read.parquet(s"$dir/seen")
    def time(name: String)(mk: => DataFrame): Unit = {
      mk.write.format("noop").mode("overwrite").save() // warm
      val t = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"FRP cpus=$cpus $name%-28s $t%.2f s  (${n / t / 1e6}%.2f M/s)")
    }
    time("scan_only")(frontier)
    time("dedup")(Frontier.dedupCandidates(frontier))
    time("dedup+unseen") {
      Frontier.filterUnseenCached(Frontier.dedupCandidates(frontier), seen, bloom)
    }
    time("full_round") {
      val (sched, _, _) = Frontier.round(frontier, seen, budgetPerHost = 2000,
        seenBloom = Some(bloom))
      sched
    }
    s.stop()
  }
}
