package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.spark.{GraftFunctions => F, SynthDocs}

/**
 * r4 verdict ask #8 (optional): measure where q_dom_mutate_validate's time
 * actually goes, specifically whether the per-row ArrayData→Arena decode +
 * Arena→ArrayData rebuild inside `dom_mutate_ops` dominates. Three nested
 * variants over the same parsed corpus at sf0.1, min-of-3 wall each:
 *
 *   parse_floor — parse_html + size(nodes) agg: scan/synthesis/parse only,
 *                 no arena decode.
 *   roundtrip   — dom_mutate_ops with ONE op whose selector matches nothing
 *                 (`x.nomatch` set_attr): full decode→(no-op)→rebuild per
 *                 row; the delta over parse_floor is the arena roundtrip
 *                 cost ask #8 asks about.
 *   full        — the real q_dom_mutate_validate op list + dom_validate +
 *                 css_select: the delta over roundtrip is the genuine
 *                 mutation + validation work.
 */
object MutProf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(fn: => Long): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = fn
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val (w, n) = runs.minBy(_._1)
      println(f"[mutprof] $label%-12s ${w}%6.3f s  (rows/agg=$n, all=${runs.map(r => f"${r._1}%.3f").mkString(",")})")
    }

    def base: DataFrame = SynthDocs.partDocs(spark, sfDir)

    time("parse_floor") {
      base.agg(sum(size(col("nodes")))).collect()(0).getLong(0)
    }
    time("roundtrip") {
      base.withColumn("nodes2",
          F.dom_mutate_ops(col("nodes"), Seq(
            ("x.nomatch", "set_attr", lit("rel"), lit("nofollow")))))
        .agg(sum(size(col("nodes2")))).collect()(0).getLong(0)
    }
    time("full") {
      base.withColumn("nodes2",
          F.dom_mutate_ops(col("nodes"), Seq(
            ("a.plink", "set_attr", lit("rel"), lit("nofollow")),
            ("ul.words", "append_html", lit("<li class=\"extra\">tail</li>"), lit(null)))))
        .select(col("doc_id"),
          F.dom_validate(col("nodes2")).isNull.as("is_valid"),
          size(F.css_select(col("nodes2"), "li.extra")).cast("long").as("n_extra"))
        // agg over the computed columns — a bare count() lets Catalyst prune
        // the whole projection (and the parse) out of the plan
        .agg(sum(when(col("is_valid"), col("n_extra")))).collect()(0).getLong(0)
    }
    spark.stop()
  }
}
