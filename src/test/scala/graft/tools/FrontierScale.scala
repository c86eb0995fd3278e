package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.crawl.Frontier

/** Dev probe for the 2->8 scaling-efficiency criterion: same stored-input
  * frontier round at local[2] and local[8], with/without AQE, several timed
  * repeats per session — separates engine scaling from constant driver-side
  * cost (planning, AQE coordination, stage barriers). */
object FrontierScale {
  def main(args: Array[String]): Unit = {
    val mult = if (args.nonEmpty) args(0).toInt else 16
    val dir = "/dev/shm/graft-scale"
    def session(n: Int, aqe: Boolean): SparkSession = {
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      val s = SparkSession.builder().master(s"local[$n]")
        .appName(s"scale-$n-$aqe")
        .config("spark.sql.shuffle.partitions", 64)
        .config("spark.sql.adaptive.enabled", aqe.toString)
        .config("spark.ui.enabled", "false")
        .config("spark.local.dir", "/dev/shm/graft-spark")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN"); s
    }
    // materialize once
    val prep = session(8, aqe = true)
    val li = prep.read.parquet("/root/testdata/sf0.1/lineitem.parquet").repartition(16)
    val frontier = li.select(
        explode(expr(s"sequence(0, ${mult - 1})")).as("m"),
        col("l_suppkey"), col("l_partkey"), col("l_orderkey"), col("l_linenumber"))
      .select(
        concat(lit("https://host-"), pmod(col("l_suppkey") + col("m") * 7, lit(200)),
          lit(".example/part/"), col("l_partkey"), lit("/v"), col("m")).as("url"),
        concat(lit("host-"), pmod(col("l_suppkey") + col("m") * 7, lit(200)),
          lit(".example")).as("host"),
        col("l_linenumber").cast("int").as("priority"),
        (col("l_orderkey") * 64 + col("l_linenumber") * 8 + col("m")).cast("long").as("seq"))
    frontier.write.mode("overwrite").parquet(s"$dir/frontier")
    frontier.filter(pmod(xxhash64(col("url")), lit(8)) === 0)
      .select("url").distinct().write.mode("overwrite").parquet(s"$dir/seen")
    val bloomBits = 1L << 24
    val bloom = Frontier.urlBloom(prep.read.parquet(s"$dir/seen"),
      Frontier.bloomExpectedItems(bloomBits), bloomBits)
    val nUrls = prep.read.parquet(s"$dir/frontier").count()
    prep.stop()
    println(s"URLS=$nUrls")
    def run(s: SparkSession): Double = {
      val f = s.read.parquet(s"$dir/frontier")
      val seen = s.read.parquet(s"$dir/seen")
      val t0 = System.nanoTime()
      val (sched, _, _) = Frontier.round(f, seen, budgetPerHost = 2000,
        seenBloom = Some(bloom))
      sched.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    for (aqe <- Seq(true, false); n <- Seq(2, 8, 2, 8)) {
      val s = session(n, aqe)
      try {
        val ts = (1 to 3).map(_ => run(s))
        println(f"n=$n aqe=$aqe  ${ts.map(t => f"$t%.1f").mkString(" ")}  min=${ts.min}%.1f")
      } finally { s.stop(); System.gc() }
    }
  }
}
