package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.TextPipeline

/** Dev probe: decompose q_text_analysis wall time by column group (r3 ask #1
  * root-cause). Times the full projection and ablations with one column
  * family removed each, on the sf0.1 documents table. */
object TAProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.spark.GraftFunctions.register(spark)
    val docs = TextPipeline.documents(spark, "/root/testdata/sf0.1")

    val scores = TextPipeline.langMarkers.map { case (lang, markers) =>
      (lang, TextPipeline.langScoreSql("toks", markers))
    }
    val maxScore = scores.map(_._2).mkString("greatest(", ", ", ")")
    val langGuess = scores.map { case (l, s) =>
      s"WHEN $s >= $maxScore THEN '$l'"
    }.mkString("CASE ", " ", " END")
    val stop = TextPipeline.langMarkers.flatMap(_._2).distinct.map(m => s"'$m'")
      .mkString("array(", ", ", ")")

    def base = docs.withColumn("toks", expr(TextPipeline.tokensSql("text")))
    val variants: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "full" -> (() => TextPipeline.textAnalysis(docs)),
      "toks_only" -> (() => base.select(col("doc_id"), expr("size(toks)").as("n"))),
      "chars_norm" -> (() => base.select(col("doc_id"),
        expr("length(regexp_replace(trim(text), '\\\\s+', ' '))").as("n"))),
      "lang_case_inline" -> (() => base.select(col("doc_id"), expr(langGuess).as("l"))),
      "lang_scores_cols" -> (() => {
        var d = base
        scores.foreach { case (l, s) => d = d.withColumn(s"s_$l", expr(s)) }
        val mx = scores.map(x => s"s_${x._1}").mkString("greatest(", ", ", ")")
        val cse = scores.map(x => s"WHEN s_${x._1} >= $mx THEN '${x._1}'")
          .mkString("CASE ", " ", " END")
        d.select(col("doc_id"), expr(cse).as("l"))
      }),
      "stopwords" -> (() => base.select(col("doc_id"),
        expr(s"size(filter(toks, w -> array_contains($stop, w)))").as("n"))),
      "bpe_regex" -> (() => base.select(col("doc_id"),
        expr("""size(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]', 0))""").as("n"))),
      "fingerprint" -> (() => base.select(col("doc_id"),
        graft.spark.GraftFunctions.norm_fingerprint(col("text")).as("f"))))

    def time(name: String, mk: () => org.apache.spark.sql.DataFrame): Unit = {
      mk().write.format("noop").mode("overwrite").save() // warm
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"$name%-18s $t%.3f s")
    }
    variants.foreach { case (n, mk) => time(n, mk) }
    // bench-order effect: does the session state q_dedup_minhash leaves
    // behind (persisted shingle table) slow the projection that follows it?
    graft.SparkEntry.queries("q_dedup_minhash")(spark, "/root/testdata/sf0.1")
      .write.format("noop").mode("overwrite").save()
    time("full_after_minhash", () => TextPipeline.textAnalysis(docs))
    spark.stop()
  }
}
