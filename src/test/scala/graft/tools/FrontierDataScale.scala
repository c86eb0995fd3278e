package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.crawl.Frontier

/** Dev probe for DATA-size scaling (the complement of FrontierScale's
  * core-count pair): the same frontier round at local[32] over stored
  * inputs of 4.8 M → 38.4 M URLs (mult 8/16/32/64 of the sf0.1 synthesis;
  * mult 16 is the bench's 9.6 M shape). Constant urls/sec across the 8×
  * size range is the evidence that per-round cost is ∝ frontier size —
  * the property that makes the 10^10-URL target a cluster-size problem,
  * not an algorithmic one (no super-linear term from the dedup windows,
  * the bloom probe, or the politeness top-B). AQE off + explicit 64
  * partitions, matching the bench's frontier protocol; min of 3 in-session
  * runs per size, JVM warmed by the smallest size first. */
object FrontierDataScale {
  def main(args: Array[String]): Unit = {
    val mults = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(8, 16, 32, 64)
    val dir = "/dev/shm/graft-dscale"
    def synth(s: SparkSession, mult: Int) = {
      val li = s.read.parquet("/root/testdata/sf0.1/lineitem.parquet").repartition(16)
      li.select(
          explode(expr(s"sequence(0, ${mult - 1})")).as("m"),
          col("l_suppkey"), col("l_partkey"), col("l_orderkey"), col("l_linenumber"))
        .select(
          concat(lit("https://host-"), pmod(col("l_suppkey") + col("m") * 7, lit(200)),
            lit(".example/part/"), col("l_partkey"), lit("/v"), col("m")).as("url"),
          concat(lit("host-"), pmod(col("l_suppkey") + col("m") * 7, lit(200)),
            lit(".example")).as("host"),
          col("l_linenumber").cast("int").as("priority"),
          (col("l_orderkey") * 64 + col("l_linenumber") * 8 + col("m")).cast("long").as("seq"))
    }
    val prep = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    prep.sparkContext.setLogLevel("ERROR")
    val counts = mults.map { m =>
      val f = synth(prep, m)
      f.write.mode("overwrite").parquet(s"$dir/frontier-$m")
      f.filter(pmod(xxhash64(col("url")), lit(8)) === 0)
        .select("url").distinct().write.mode("overwrite").parquet(s"$dir/seen-$m")
      m -> prep.read.parquet(s"$dir/frontier-$m").count()
    }.toMap
    val bloomBits = 1L << 26 // sized for the largest seen set (~4.4 M urls)
    val blooms = mults.map { m =>
      m -> Frontier.urlBloom(prep.read.parquet(s"$dir/seen-$m"),
        Frontier.bloomExpectedItems(bloomBits), bloomBits)
    }.toMap
    prep.stop()
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def run(m: Int): Double = {
      val f = s.read.parquet(s"$dir/frontier-$m")
      val seen = s.read.parquet(s"$dir/seen-$m")
      val t0 = System.nanoTime()
      val (sched, _, _) = Frontier.round(f, seen, budgetPerHost = 2000,
        seenBloom = Some(blooms(m)))
      sched.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(s"sizes: ${mults.map(m => s"mult=$m urls=${counts(m)}").mkString("  ")}")
    val results = for (m <- mults) yield {
      val ts = (1 to 3).map(_ => run(m))
      val thr = counts(m) / ts.min
      println(f"mult=$m%-3d urls=${counts(m)}%9d  walls=${ts.map(t => f"$t%.1f").mkString("/")}  min=${ts.min}%5.1f s  thr=${thr / 1e6}%.2f M urls/s")
      (m, counts(m), ts.min, thr)
    }
    val base = results.find(_._1 == mults.head).get._4
    for ((m, _, _, thr) <- results)
      println(f"mult=$m%-3d relative_throughput=${thr / base}%.3f (1.0 = flat linear scaling)")
    s.stop()
  }
}
