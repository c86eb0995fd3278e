package graft

import org.apache.spark.sql.SparkSession

/**
 * Optimization-round helper bench (guide §1.4): times any subset of the
 * declared queries through the noop sink (warmup + min of N), and dumps
 * `.explain("formatted")` plans. NOT part of the driver contract —
 * `Bench.scala` stays the only measured harness; numbers from here are
 * cited in OPTIMIZATION_r06.md as iteration evidence only.
 *
 * Usage:
 *   sbt "runMain graft.BenchExtra [queryName ...]"        — time queries
 *   sbt "runMain graft.BenchExtra --plans outDir [q ...]" — dump plans
 * With no query names: the 13 headline queries.
 */
object BenchExtra {

  private val headline = Seq(
    "q_links", "q_dom_select_tag", "q_dom_text", "q_dom_mutate_class",
    "q_dom_mutate_validate", "q_dom_formatted_text", "q_crawl_schedule",
    "q_dedup_minhash", "q_text_analysis", "q_ann_topk", "q_ann_lsh",
    "q_ann_ivf", "q_embed_neardup")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_EXTRA_REPS", "3").toInt

    val (planDir, names0) = args.toSeq match {
      case Seq("--plans", dir, rest @ _*) => (Some(dir), rest)
      case other => (None, other)
    }
    val names = if (names0.nonEmpty) names0 else headline

    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")

    try {
      val results = scala.collection.mutable.LinkedHashMap[String, Double]()
      names.foreach { name =>
        val fn = SparkEntry.queries(name)
        planDir match {
          case Some(dir) =>
            val f = new java.io.File(dir); f.mkdirs()
            val out = new java.io.PrintWriter(s"$dir/$name.txt")
            try out.println(fn(s, sfDir).queryExecution.explainString(
              org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
            finally out.close()
            println(s"plan: $dir/$name.txt")
          case None =>
            s.sparkContext.setJobDescription(s"extra:$name")
            fn(s, sfDir).write.format("noop").mode("overwrite").save() // warmup
            val t = (1 to reps).map { _ =>
              val t0 = System.nanoTime()
              fn(s, sfDir).write.format("noop").mode("overwrite").save()
              (System.nanoTime() - t0) / 1e9
            }.min
            results(name) = t
            println(f"$name%-24s $t%.3f s")
        }
      }
      if (planDir.isEmpty) {
        val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
          .mkString("{", ",", "}")
        println(s"""{"extra_queries":$qs,"sf":"$sfDir","total":${results.values.sum}}""")
      }
    } finally s.stop()
  }
}
