package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.spark.{GraftFunctions => F}

/** r6 probe: how much of each DOM headline query is the range-partitioning
  * double-execution of the parse projection (orderBy samples its child), and
  * does sorting the cheap base columns FIRST (parse downstream of the sort,
  * order preserved by per-partition projection) recover it? */
object SortFirstProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    F.register(spark)

    def time(name: String)(mk: => DataFrame): Unit = {
      mk.write.format("noop").mode("overwrite").save()
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"$name%-36s $t%.3f s")
    }

    // --- partDocs family -------------------------------------------------
    time("part parse only (no sort)") {
      graft.spark.SynthDocs.partDocs(spark, dir).select("doc_id", "nodes")
    }
    time("part parse+select (no sort)") {
      graft.spark.SynthDocs.partDocs(spark, dir)
        .select(col("doc_id"),
          size(F.css_select(col("nodes"), "li")).cast("long").as("n_li"))
    }
    time("q_dom_select_tag (as declared)") {
      graft.SparkEntry.queries("q_dom_select_tag")(spark, dir)
    }
    time("q_dom_select_tag sort-first") {
      val part = spark.read.parquet(s"$dir/part.parquet")
        .select(col("p_partkey").cast("string").as("doc_id"),
          col("p_name"), col("p_brand"), col("p_type"), col("p_size"), col("p_partkey"))
        .orderBy("doc_id")
      part.select(col("doc_id"),
        size(F.css_select(F.parse_html(graft.spark.SynthDocs.partHtml(col("p_partkey"),
          col("p_name"), col("p_brand"), col("p_type"), col("p_size"))), "li"))
          .cast("long").as("n_li"))
    }

    // --- hnDocs / q_links ------------------------------------------------
    time("hn parse only (no sort)") {
      graft.spark.SynthDocs.hnDocs(spark, dir).select("doc_id", "nodes")
    }
    time("q_links (as declared)") {
      graft.SparkEntry.queries("q_links")(spark, dir)
    }
    time("q_links sort-first") {
      val orders = spark.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey").cast("string").as("doc_id"),
          col("o_orderkey"), col("o_custkey"), col("o_orderstatus"), col("o_orderpriority"))
        .orderBy("doc_id")
      val docs = orders.select(col("doc_id"),
        F.parse_html(graft.spark.SynthDocs.hnHtml(col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"), col("o_orderpriority"))).as("nodes"))
      docs
        .withColumn("athing", F.css_select(col("nodes"), "tr.athing:has(a[href][id])"))
        .withColumn("title_a", F.css_select_under(col("nodes"), col("athing"), ".title a.storylink"))
        .select(
          col("doc_id"),
          F.dom_attr(col("nodes"), col("title_a"), "href").as("href"),
          F.dom_text(col("nodes"), col("title_a")).as("title"),
          F.dom_text(col("nodes"),
            F.css_select_under(col("nodes"), col("athing"), ".sitebit a")).as("source"))
    }
    // sort-first with explicit range repartition (AQE cannot coalesce
    // REPARTITION_BY_NUM) so the downstream parse keeps its parallelism
    time("q_links sort-first rbr64") {
      val orders = spark.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey").cast("string").as("doc_id"),
          col("o_orderkey"), col("o_custkey"), col("o_orderstatus"), col("o_orderpriority"))
        .repartitionByRange(64, col("doc_id"))
        .sortWithinPartitions("doc_id")
      val docs = orders.select(col("doc_id"),
        F.parse_html(graft.spark.SynthDocs.hnHtml(col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"), col("o_orderpriority"))).as("nodes"))
      docs
        .withColumn("athing", F.css_select(col("nodes"), "tr.athing:has(a[href][id])"))
        .withColumn("title_a", F.css_select_under(col("nodes"), col("athing"), ".title a.storylink"))
        .select(
          col("doc_id"),
          F.dom_attr(col("nodes"), col("title_a"), "href").as("href"),
          F.dom_text(col("nodes"), col("title_a")).as("title"),
          F.dom_text(col("nodes"),
            F.css_select_under(col("nodes"), col("athing"), ".sitebit a")).as("source"))
    }
    time("q_dom_select_tag sort-first rbr64") {
      val part = spark.read.parquet(s"$dir/part.parquet")
        .select(col("p_partkey").cast("string").as("doc_id"),
          col("p_name"), col("p_brand"), col("p_type"), col("p_size"), col("p_partkey"))
        .repartitionByRange(64, col("doc_id"))
        .sortWithinPartitions("doc_id")
      part.select(col("doc_id"),
        size(F.css_select(F.parse_html(graft.spark.SynthDocs.partHtml(col("p_partkey"),
          col("p_name"), col("p_brand"), col("p_type"), col("p_size"))), "li"))
          .cast("long").as("n_li"))
    }
    spark.stop()
  }
}
