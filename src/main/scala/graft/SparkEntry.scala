package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.spark.{GraftFunctions => F, SynthDocs}
import graft.crawl.Frontier

/**
 * Driver contract (see SURVEY.md §7). Every entry exercises one operator
 * family from SURVEY.md §2 through the real engine (HTML synthesis →
 * parse_html → selector/extraction/mutation expressions), while the DuckDB
 * oracle computes the expected output *relationally* from the same base
 * parquet — the outputs agree iff the engine is correct.
 */
object SparkEntry {

  /** Flagship: the reference's hacker_news link-extraction workload
    * (`examples/hacker_news.rs:7-13`) over synthesized docs at sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    qLinks(spark, "/root/testdata/sf0.001")

  // --- shared builders --------------------------------------------------------

  private def parts(s: SparkSession, dir: String): DataFrame =
    SynthDocs.partDocs(s, dir)

  /** The flagship extraction: select story rows, then chained sub-selects —
    * the serial-decomposition pattern the reference benches as fastest
    * (dom-query-bench/README.md:15). */
  private def qLinks(s: SparkSession, dir: String): DataFrame = {
    val docs = SynthDocs.hnDocs(s, dir)
    docs
      .withColumn("athing", F.css_select(col("nodes"), "tr.athing:has(a[href][id])"))
      .withColumn("title_a", F.css_select_under(col("nodes"), col("athing"), ".title a.storylink"))
      .select(
        col("doc_id"),
        F.dom_attr(col("nodes"), col("title_a"), "href").as("href"),
        F.dom_text(col("nodes"), col("title_a")).as("title"),
        F.dom_text(col("nodes"),
          F.css_select_under(col("nodes"), col("athing"), ".sitebit a")).as("source"))
      .orderBy("doc_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1: parse — node count is a pure function of p_name word count
    "q_dom_parse_count" -> ((s, dir) =>
      parts(s, dir)
        .select(col("doc_id"), size(col("nodes")).cast("long").as("n_nodes"))
        .orderBy("doc_id")),

    // P3/Q1: tag select
    "q_dom_select_tag" -> ((s, dir) =>
      parts(s, dir)
        .select(col("doc_id"),
          size(F.css_select(col("nodes"), "li")).cast("long").as("n_li"))
        .orderBy("doc_id")),

    // P5/P7: class + first-child + text extraction
    "q_dom_first_child_text" -> ((s, dir) =>
      parts(s, dir)
        .select(col("doc_id"),
          F.dom_text(col("nodes"),
            F.css_select(col("nodes"), "ul.words li:first-child")).as("first_word"))
        .orderBy("doc_id")),

    // P7: nth-child
    "q_dom_nth_child" -> ((s, dir) =>
      parts(s, dir)
        .select(col("doc_id"),
          F.dom_text(col("nodes"),
            F.css_select(col("nodes"), "ul.words li:nth-child(2)")).as("second_word"))
        .orderBy("doc_id")),

    // X1: attribute extraction
    "q_dom_attr" -> ((s, dir) =>
      parts(s, dir)
        .select(col("doc_id"),
          F.dom_attr(col("nodes"), F.css_select(col("nodes"), "a.plink"), "href").as("href"))
        .orderBy("doc_id")),

    // X6 + child combinator
    "q_dom_text" -> ((s, dir) =>
      parts(s, dir)
        .select(col("doc_id"),
          F.dom_text(col("nodes"), F.css_select(col("nodes"), "#main > a")).as("type_text"))
        .orderBy("doc_id")),

    // F5: base_uri fast path
    "q_dom_base_uri" -> ((s, dir) =>
      parts(s, dir)
        .select(col("doc_id"), F.dom_base_uri(col("nodes")).as("base_uri"))
        .orderBy("doc_id")),

    // Q3: chained select under a selection
    "q_dom_select_under" -> ((s, dir) =>
      parts(s, dir)
        .select(col("doc_id"),
          size(F.css_select_under(col("nodes"),
            F.css_select(col("nodes"), "#main"), ".words li")).cast("long").as("n_under"))
        .orderBy("doc_id")),

    // Q4: filter with is-semantics (odd positions)
    "q_dom_filter" -> ((s, dir) =>
      parts(s, dir)
        .select(col("doc_id"),
          size(F.css_filter(col("nodes"),
            F.css_select(col("nodes"), "ul.words li"), ":nth-child(odd)")).cast("long")
            .as("n_odd"))
        .orderBy("doc_id")),

    // Q8: is
    "q_dom_is" -> ((s, dir) =>
      parts(s, dir)
        .select(col("doc_id"),
          F.css_is(col("nodes"), F.css_select(col("nodes"), "#main"), "div.part")
            .as("is_part"))
        .orderBy("doc_id")),

    // S4: HTML serialization
    "q_dom_html" -> ((s, dir) =>
      parts(s, dir)
        .select(col("doc_id"),
          F.dom_html(col("nodes"), F.css_select(col("nodes"), "a.plink")).as("a_html"))
        .orderBy("doc_id")),

    // X11: normalized char count (streaming fold)
    "q_dom_norm_chars" -> ((s, dir) =>
      parts(s, dir)
        .select(col("doc_id"),
          F.dom_norm_char_count(col("nodes"),
            F.css_select(col("nodes"), "#main")).as("n_chars"))
        .orderBy("doc_id")),

    // M15 via dom_mutate + re-select
    "q_dom_mutate_class" -> ((s, dir) =>
      parts(s, dir)
        .withColumn("nodes2", F.dom_mutate(col("nodes"), "ul.words li", "add_class", lit("marked")))
        .select(col("doc_id"),
          size(F.css_select(col("nodes2"), "ul.words li.marked")).cast("long").as("n_marked"))
        .orderBy("doc_id")),

    // M7: removal keeps ids stable, selection shrinks
    "q_dom_mutate_remove" -> ((s, dir) =>
      parts(s, dir)
        .withColumn("nodes2", F.dom_mutate(col("nodes"), "ul.words li:first-child", "remove"))
        .select(col("doc_id"),
          size(F.css_select(col("nodes2"), "li")).cast("long").as("n_li_left"))
        .orderBy("doc_id")),

    // C4: validate after a mutation pipeline
    "q_dom_mutate_validate" -> ((s, dir) =>
      parts(s, dir)
        .withColumn("nodes2",
          F.dom_mutate(
            F.dom_mutate(col("nodes"), "a.plink", "set_attr", lit("rel"), lit("nofollow")),
            "ul.words", "append_html", lit("<li class=\"extra\">tail</li>")))
        .select(col("doc_id"),
          F.dom_validate(col("nodes2")).isNull.as("is_valid"),
          size(F.css_select(col("nodes2"), "li.extra")).cast("long").as("n_extra"))
        .orderBy("doc_id")),

    // flagship link extraction (P10 :has + Q3 chains + X1/X6)
    "q_links" -> ((s, dir) => qLinks(s, dir)),

    // crawl layer: URL canonicalizer over deterministic messy variants
    "q_url_canonicalize" -> ((s, dir) => {
      graft.spark.GraftFunctions.register(s)
      val part = s.read.parquet(s"$dir/part.parquet")
      val raw = when(pmod(col("p_partkey"), lit(5)) === 0,
          concat(lit("HTTPS://Parts.Example:443/catalog/x/../item/"), col("p_partkey"), lit("#frag")))
        .when(pmod(col("p_partkey"), lit(5)) === 1,
          concat(lit("item/"), col("p_partkey"), lit("?a=1")))
        .when(pmod(col("p_partkey"), lit(5)) === 2,
          concat(lit("http://parts.example:80/item/"), col("p_partkey")))
        .when(pmod(col("p_partkey"), lit(5)) === 3, lit("mailto:someone@example.com"))
        .otherwise(concat(lit("/rooted/"), col("p_partkey")))
      part.select(col("p_partkey").cast("string").as("doc_id"),
          F.canonicalize_url(raw, lit("https://parts.example/catalog/")).as("canon"))
        .orderBy("doc_id")
    }),

    // crawl layer: candidate dedup + URL-seen anti-join, per-host counts
    "q_crawl_dedup" -> ((s, dir) => {
      val (frontier, seen) = synthFrontier(s, dir)
      Frontier.filterUnseen(Frontier.dedupCandidates(frontier), seen)
        .groupBy("host").agg(count(lit(1)).as("n_new"))
        .orderBy("host")
    }),

    // crawl layer: same result through the bloom-prefilter path (scale path)
    "q_crawl_dedup_bloom" -> ((s, dir) => {
      val (frontier, seen) = synthFrontier(s, dir)
      Frontier.filterUnseen(Frontier.dedupCandidates(frontier), seen, bloomBits = 1 << 22)
        .groupBy("host").agg(count(lit(1)).as("n_new"))
        .orderBy("host")
    }),

    // crawl layer: full round — politeness top-B per host + global priority order
    "q_crawl_schedule" -> ((s, dir) => {
      val (frontier, seen) = synthFrontier(s, dir)
      val (sched, _, _) = Frontier.round(frontier, seen, budgetPerHost = 3)
      sched.select(col("url"), col("host"),
          col("priority").cast("long").as("priority"),
          col("seq").cast("long").as("seq"),
          col("slot").cast("long").as("slot"))
        .orderBy(col("priority").desc, col("seq").asc, col("url").asc)
    })
  )

  /** Deterministic synthetic frontier from lineitem: url repeats across
    * orders (same supplier-host × part) so dedup is meaningful; the seen set
    * is derivable from the same table on both engines. */
  private def synthFrontier(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val li = s.read.parquet(s"$dir/lineitem.parquet")
    val f = li.select(
      concat(lit("https://host-"), pmod(col("l_suppkey"), lit(50)),
        lit(".example/part/"), col("l_partkey")).as("url"),
      concat(lit("host-"), pmod(col("l_suppkey"), lit(50)), lit(".example")).as("host"),
      col("l_linenumber").cast("int").as("priority"),
      (col("l_orderkey") * 8 + col("l_linenumber")).cast("long").as("seq"),
      col("l_quantity"))
    val seen = f.filter(col("l_quantity") < 5).select("url").distinct()
    (f.drop("l_quantity"), seen)
  }

  def oracleSql: Map[String, String] = {
    val W = "len(string_split(p_name, ' '))" // word count
    Map(
      "q_dom_parse_count" ->
        s"""SELECT cast(p_partkey as varchar) AS doc_id,
            cast(13 + 2 * $W as bigint) AS n_nodes
            FROM part ORDER BY doc_id""",
      "q_dom_select_tag" ->
        s"""SELECT cast(p_partkey as varchar) AS doc_id,
            cast($W as bigint) AS n_li
            FROM part ORDER BY doc_id""",
      "q_dom_first_child_text" ->
        """SELECT cast(p_partkey as varchar) AS doc_id,
           string_split(p_name, ' ')[1] AS first_word
           FROM part ORDER BY doc_id""",
      "q_dom_nth_child" ->
        s"""SELECT cast(p_partkey as varchar) AS doc_id,
            CASE WHEN $W >= 2 THEN string_split(p_name, ' ')[2] ELSE '' END AS second_word
            FROM part ORDER BY doc_id""",
      "q_dom_attr" ->
        """SELECT cast(p_partkey as varchar) AS doc_id,
           '/part/' || p_partkey AS href
           FROM part ORDER BY doc_id""",
      "q_dom_text" ->
        """SELECT cast(p_partkey as varchar) AS doc_id,
           p_type AS type_text
           FROM part ORDER BY doc_id""",
      "q_dom_base_uri" ->
        """SELECT cast(p_partkey as varchar) AS doc_id,
           'https://parts.example/catalog/' AS base_uri
           FROM part ORDER BY doc_id""",
      "q_dom_select_under" ->
        s"""SELECT cast(p_partkey as varchar) AS doc_id,
            cast($W as bigint) AS n_under
            FROM part ORDER BY doc_id""",
      "q_dom_filter" ->
        s"""SELECT cast(p_partkey as varchar) AS doc_id,
            cast(($W + 1) // 2 as bigint) AS n_odd
            FROM part ORDER BY doc_id""",
      "q_dom_is" ->
        """SELECT cast(p_partkey as varchar) AS doc_id,
           true AS is_part
           FROM part ORDER BY doc_id""",
      "q_dom_html" ->
        """SELECT cast(p_partkey as varchar) AS doc_id,
           '<a href="/part/' || p_partkey || '" class="plink">' || p_type || '</a>' AS a_html
           FROM part ORDER BY doc_id""",
      "q_dom_norm_chars" ->
        """SELECT cast(p_partkey as varchar) AS doc_id,
           cast(length(p_type) + length(replace(p_name, ' ', ''))
                + 5 + length(cast(p_size as varchar)) as bigint) AS n_chars
           FROM part ORDER BY doc_id""",
      "q_dom_mutate_class" ->
        s"""SELECT cast(p_partkey as varchar) AS doc_id,
            cast($W as bigint) AS n_marked
            FROM part ORDER BY doc_id""",
      "q_dom_mutate_remove" ->
        s"""SELECT cast(p_partkey as varchar) AS doc_id,
            cast($W - 1 as bigint) AS n_li_left
            FROM part ORDER BY doc_id""",
      "q_dom_mutate_validate" ->
        """SELECT cast(p_partkey as varchar) AS doc_id,
           true AS is_valid, cast(1 as bigint) AS n_extra
           FROM part ORDER BY doc_id""",
      "q_links" ->
        """SELECT cast(o_orderkey as varchar) AS doc_id,
           'item?id=' || o_orderkey AS href,
           'Order ' || o_orderkey || ' [' || o_orderpriority || ']' AS title,
           'cust-' || o_custkey || '.example' AS source
           FROM orders ORDER BY doc_id""",
      "q_url_canonicalize" ->
        """SELECT cast(p_partkey as varchar) AS doc_id,
           CASE p_partkey % 5
             WHEN 0 THEN 'https://parts.example/catalog/item/' || p_partkey
             WHEN 1 THEN 'https://parts.example/catalog/item/' || p_partkey || '?a=1'
             WHEN 2 THEN 'http://parts.example/item/' || p_partkey
             WHEN 3 THEN NULL
             ELSE 'https://parts.example/rooted/' || p_partkey
           END AS canon
           FROM part ORDER BY doc_id""",
      "q_crawl_dedup" -> crawlDedupSql,
      "q_crawl_dedup_bloom" -> crawlDedupSql,
      "q_crawl_schedule" ->
        s"""WITH $frontierCte,
            cand AS (SELECT url, host, max(priority) AS priority, min(seq) AS seq
                     FROM f GROUP BY url, host),
            unseen AS (SELECT * FROM cand WHERE url NOT IN (SELECT url FROM seen)),
            ranked AS (SELECT *, row_number() OVER
                         (PARTITION BY host ORDER BY priority DESC, seq ASC, url ASC) - 1 AS slot
                       FROM unseen)
            SELECT url, host, cast(priority as bigint) AS priority,
                   cast(seq as bigint) AS seq, cast(slot as bigint) AS slot
            FROM ranked WHERE slot < 3
            ORDER BY priority DESC, seq ASC, url ASC"""
    )
  }

  private val frontierCte =
    """f AS (SELECT 'https://host-' || (l_suppkey % 50) || '.example/part/' || l_partkey AS url,
              'host-' || (l_suppkey % 50) || '.example' AS host,
              l_linenumber AS priority,
              l_orderkey * 8 + l_linenumber AS seq,
              l_quantity FROM lineitem),
       seen AS (SELECT DISTINCT url FROM f WHERE l_quantity < 5)"""

  private val crawlDedupSql =
    s"""WITH $frontierCte,
        cand AS (SELECT url, host, max(priority) AS priority, min(seq) AS seq
                 FROM f GROUP BY url, host),
        unseen AS (SELECT * FROM cand WHERE url NOT IN (SELECT url FROM seen))
        SELECT host, cast(count(*) as bigint) AS n_new
        FROM unseen GROUP BY host ORDER BY host"""
}
