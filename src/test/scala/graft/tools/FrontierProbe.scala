package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.crawl.Frontier

object FrontierProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val mult = if (args.length > 1) args(1).toInt else 40
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus * 2)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .repartition(cpus * 2)
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
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROBE cpus=$cpus $name ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    time("warm_count")(frontier.count())
    time("build_noop")(frontier.write.format("noop").mode("overwrite").save())
    val cand = Frontier.dedupCandidates(frontier)
    time("dedup_noop")(cand.write.format("noop").mode("overwrite").save())
    val seen = frontier.filter(pmod(xxhash64(col("url")), lit(8)) === 0).select("url").distinct()
    time("seen_distinct")(seen.write.format("noop").mode("overwrite").save())
    val unseen = Frontier.filterUnseen(cand, seen, 1L << 24)
    time("unseen_noop")(unseen.write.format("noop").mode("overwrite").save())
    val sched = Frontier.schedule(unseen, 2000)
    time("sched_noop")(sched.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
