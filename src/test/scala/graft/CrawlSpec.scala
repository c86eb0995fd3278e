package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.crawl.{Frontier, OracleCrawler, UrlCanon}
import java.nio.file.Files

/** Crawl-order + URL-seen equality: the distributed Frontier must match the
  * single-threaded OracleCrawler exactly, round by round, under the same seed
  * list + politeness budget (north_rule). */
class CrawlSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import OracleCrawler.Url

  /** Deterministic seed list: 4 hosts, skewed (host-0 gets 5× the urls).
    * host-1 is http:// and host-2 carries a non-default port, so the robots
    * path derivation is exercised beyond the fixed 'https://' prefix. */
  def seed: Seq[Url] = (0 until 200).map { i =>
    val idx = Seq(0, 0, 0, 0, 0, 1, 2, 3)(i % 8)
    val host = idx match {
      case 2 => "host-2.example:8443"
      case n => s"host-$n.example"
    }
    val scheme = if (idx == 1) "http" else "https"
    Url(s"$scheme://$host/p/${i % 120}", host, priority = i % 5, seq = i.toLong)
  }

  /** Deterministic discovery: each scheduled url yields one child url. */
  def discoverOracle(scheduled: Vector[Url]): Seq[Url] =
    scheduled.map(u => Url(u.url + "/c", u.host, (u.priority + 3) % 5, u.seq + 10000))

  def toDf(us: Seq[Url]) = {
    import spark.implicits._
    us.map(u => (u.url, u.host, u.priority, u.seq)).toDF("url", "host", "priority", "seq")
  }

  test("single round: scheduled order, slots, seen set match oracle (exact + bloom)") {
    // non-empty initial seen so the bloom prefilter path actually runs
    val preSeen = seed.filter(_.seq % 3 == 0).map(_.url).distinct
    for (bloomBits <- Seq(0L, 1L << 20)) {
      val seen0 = scala.collection.mutable.Set[String](preSeen: _*)
      val (oracleRes, _) = OracleCrawler.round(seed, seen0, budgetPerHost = 3)

      import spark.implicits._
      val (sched, newSeen, _) = Frontier.round(toDf(seed),
        preSeen.toDF("url"), budgetPerHost = 3, bloomBits = bloomBits)
      val sparkSched = sched
        .orderBy(col("priority").desc, col("seq").asc, col("url").asc)
        .collect()
        .map(r => (r.getAs[String]("url"), r.getAs[Int]("slot")))

      assert(sparkSched.map(_._1).toVector == oracleRes.scheduled.map(_.url),
        s"order mismatch (bloomBits=$bloomBits)")
      sparkSched.foreach { case (url, slot) =>
        assert(slot == oracleRes.slots(url), s"slot mismatch for $url")
      }
      val sparkSeen = newSeen.collect().map(_.getString(0)).toSet
      assert(sparkSeen == seen0.toSet)
    }
  }

  test("filterUnseen leaves no temp view behind (catalog stays clean)") {
    import spark.implicits._
    val before = spark.catalog.listTables().count()
    val seen = seed.filter(_.seq % 3 == 0).map(_.url).distinct.toDF("url")
    (1 to 3).foreach { _ =>
      Frontier.filterUnseen(Frontier.dedupCandidates(toDf(seed)), seen,
        bloomBits = 1L << 20).count()
    }
    assert(spark.catalog.listTables().count() == before,
      "filterUnseen leaked temp views into the session catalog")
  }

  test("multi-round crawl with discovery: per-round schedule + final seen match oracle") {
    val (oracleRounds, oracleSeen) =
      OracleCrawler.crawl(seed, rounds = 4, budgetPerHost = 2, discoverOracle)

    val root = Files.createTempDirectory("crawl_ck").toString
    import spark.implicits._
    val metrics = Frontier.crawl(spark, root, toDf(seed), rounds = 4, budgetPerHost = 2,
      discover = sched => Some(
        sched.select(
          concat(col("url"), lit("/c")).as("url"),
          col("host"),
          pmod(col("priority") + 3, lit(5)).cast("int").as("priority"),
          (col("seq") + 10000).cast("long").as("seq"))))

    assert(metrics.length == oracleRounds.length)
    oracleRounds.zipWithIndex.foreach { case (or, i) =>
      val sparkRound = spark.read.parquet(s"${Frontier.snapshotDir(root, i)}/scheduled")
        .orderBy(col("priority").desc, col("seq").asc, col("url").asc)
        .collect().map(_.getAs[String]("url")).toVector
      assert(sparkRound == or.scheduled.map(_.url), s"round $i order mismatch")
    }
    val lastSeen = spark.read
      .parquet(s"${Frontier.snapshotDir(root, oracleRounds.length - 1)}/seen")
      .collect().map(_.getString(0)).toSet
    assert(lastSeen == oracleSeen)
  }

  test("cached incremental bloom across rounds + resume: equality holds, bloom persisted") {
    val (oracleRounds, oracleSeen) =
      OracleCrawler.crawl(seed, rounds = 4, budgetPerHost = 2, discoverOracle)

    val root = Files.createTempDirectory("crawl_bloom_ck").toString
    import spark.implicits._
    val disc = (sched: org.apache.spark.sql.DataFrame) => Some(
      sched.select(
        concat(col("url"), lit("/c")).as("url"),
        col("host"),
        pmod(col("priority") + 3, lit(5)).cast("int").as("priority"),
        (col("seq") + 10000).cast("long").as("seq")))
    // 2 rounds, then "crash", then resume to 4 — the resumed process loads
    // the persisted filter instead of rebuilding from the seen table
    Frontier.crawl(spark, root, toDf(seed), rounds = 2, budgetPerHost = 2,
      bloomBits = 1L << 20, discover = disc)
    assert(Files.exists(
      java.nio.file.Paths.get(s"${Frontier.snapshotDir(root, 1)}/bloom.bin")))
    Frontier.crawl(spark, root, toDf(seed), rounds = 4, budgetPerHost = 2,
      bloomBits = 1L << 20, discover = disc)

    oracleRounds.zipWithIndex.foreach { case (or, i) =>
      val sparkRound = spark.read.parquet(s"${Frontier.snapshotDir(root, i)}/scheduled")
        .orderBy(col("priority").desc, col("seq").asc, col("url").asc)
        .collect().map(_.getAs[String]("url")).toVector
      assert(sparkRound == or.scheduled.map(_.url), s"round $i order mismatch (bloom)")
    }
    val lastSeen = spark.read
      .parquet(s"${Frontier.snapshotDir(root, oracleRounds.length - 1)}/seen")
      .collect().map(_.getString(0)).toSet
    assert(lastSeen == oracleSeen)
  }

  test("legacy/untagged bloom sidecar is discarded on resume (key-space guard)") {
    import spark.implicits._
    val (oracleRounds, oracleSeen) =
      OracleCrawler.crawl(seed, rounds = 4, budgetPerHost = 2, discoverOracle)
    val root = Files.createTempDirectory("crawl_bloom_legacy").toString
    val disc = (sched: org.apache.spark.sql.DataFrame) => Some(
      sched.select(
        concat(col("url"), lit("/c")).as("url"),
        col("host"),
        pmod(col("priority") + 3, lit(5)).cast("int").as("priority"),
        (col("seq") + 10000).cast("long").as("seq")))
    Frontier.crawl(spark, root, toDf(seed), rounds = 2, budgetPerHost = 2,
      bloomBits = 1L << 20, discover = disc)
    // simulate a pre-header sidecar: a raw-url-STRING-keyed filter with no
    // key-space tag — probed via xxhash64(url) longs it returns noise, and
    // bloom false negatives would silently skip the exact anti-join and
    // reschedule already-seen urls
    val p = java.nio.file.Paths.get(s"${Frontier.snapshotDir(root, 1)}/bloom.bin")
    val legacy = spark.read.parquet(s"${Frontier.snapshotDir(root, 1)}/seen")
      .stat.bloomFilter("url", 1000000L, 1L << 20)
    val bos = new java.io.ByteArrayOutputStream()
    legacy.writeTo(bos)
    java.nio.file.Files.write(p, bos.toByteArray)
    assert(Frontier.readTaggedBloom(p).isEmpty, "untagged sidecar must be rejected")
    // resume: the rejected sidecar forces a rebuild from the seen table, so
    // the remaining rounds still reproduce the oracle exactly
    Frontier.crawl(spark, root, toDf(seed), rounds = 4, budgetPerHost = 2,
      bloomBits = 1L << 20, discover = disc)
    val lastSeen = spark.read
      .parquet(s"${Frontier.snapshotDir(root, oracleRounds.length - 1)}/seen")
      .collect().map(_.getString(0)).toSet
    assert(lastSeen == oracleSeen)
  }

  test("checkpoint resume: restart mid-crawl reproduces identical final state") {
    import spark.implicits._
    val root = Files.createTempDirectory("crawl_resume").toString
    def disc(sched: org.apache.spark.sql.DataFrame) = Some(
      sched.select(concat(col("url"), lit("/c")).as("url"), col("host"),
        pmod(col("priority") + 3, lit(5)).cast("int").as("priority"),
        (col("seq") + 10000).cast("long").as("seq")))
    // run 2 rounds, then "crash", then resume to 4
    Frontier.crawl(spark, root, toDf(seed), rounds = 2, budgetPerHost = 2, discover = disc)
    assert(Frontier.latestSnapshot(root).contains(1))
    Frontier.crawl(spark, root, toDf(seed), rounds = 4, budgetPerHost = 2, discover = disc)
    assert(Frontier.latestSnapshot(root).contains(3))

    val (oracleRounds, oracleSeen) =
      OracleCrawler.crawl(seed, rounds = 4, budgetPerHost = 2, discoverOracle)
    val lastSeen = spark.read.parquet(s"${Frontier.snapshotDir(root, 3)}/seen")
      .collect().map(_.getString(0)).toSet
    assert(lastSeen == oracleSeen)
    val r3 = spark.read.parquet(s"${Frontier.snapshotDir(root, 3)}/scheduled")
      .orderBy(col("priority").desc, col("seq").asc, col("url").asc)
      .collect().map(_.getAs[String]("url")).toVector
    assert(r3 == oracleRounds(3).scheduled.map(_.url))
  }

  test("robots path derivation handles scheme and port shapes") {
    import spark.implicits._
    val urls = Seq(
      "https://h.example/p/1",
      "http://h.example/p/1",
      "https://h.example:8443/p/1?q=2",
      "http://h.example:80/",
      "https://h.example").toDF("url")
    val got = urls.select(Frontier.urlPath(col("url")).as("p"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("/p/1", "/p/1", "/p/1?q=2", "/", ""))
  }

  test("robots gate + token-bucket ready times match oracle") {
    import spark.implicits._
    // disallow on host-0 (https), host-1 (http) and host-2 (https + :8443) —
    // the path must be derived correctly for every scheme/port shape;
    // host-0 carries TWO disallow rules, host-1 an Allow override whose
    // longer match re-admits /p/1* URLs (Google longest-match precedence)
    val robotsMap = Map(
      "host-0.example" -> OracleCrawler.Robots(Seq("/p/1", "/p/3"), 1),
      "host-1.example" -> OracleCrawler.Robots(Seq("/p/"), 2, allowPrefixes = Seq("/p/1")),
      "host-2.example:8443" -> OracleCrawler.Robots(Seq("/p/1"), 3),
      "host-3.example" -> OracleCrawler.Robots(Nil, 1))
    val robotsDf = robotsMap.toSeq.map { case (h, r) =>
      (h, if (r.disallowPrefixes.isEmpty) null else r.disallowPrefixes,
        if (r.allowPrefixes.isEmpty) null else r.allowPrefixes, r.crawlDelayS)
    }.toDF("host", "disallow_prefixes", "allow_prefixes", "crawl_delay_s")

    val seen0 = scala.collection.mutable.Set[String]()
    val (oracleRes, _) = OracleCrawler.round(seed, seen0, budgetPerHost = 4, robotsMap)

    val (sched, newSeen, _) = Frontier.round(toDf(seed), toDf(Nil).select("url"),
      budgetPerHost = 4, robots = Some(robotsDf))
    val rows = sched.orderBy(col("priority").desc, col("seq").asc, col("url").asc)
      .collect()
      .map(r => (r.getAs[String]("url"), r.getAs[Int]("slot"), r.getAs[Long]("ready_s")))
    assert(rows.map(_._1).toVector == oracleRes.scheduled.map(_.url))
    rows.foreach { case (url, slot, ready) =>
      assert(slot == oracleRes.slots(url))
      assert(ready == oracleRes.readyS(url), s"ready_s mismatch for $url")
    }
    // disallowed urls are in seen even though never scheduled
    assert(newSeen.collect().map(_.getString(0)).toSet == seen0.toSet)
  }

  test("manifest carries metrics + per-partition lineage") {
    val root = Files.createTempDirectory("crawl_manifest").toString
    Frontier.crawl(spark, root, toDf(seed), rounds = 1, budgetPerHost = 2)
    val manifest = Files.readString(
      java.nio.file.Paths.get(s"${Frontier.snapshotDir(root, 0)}/manifest.json"))
    assert(manifest.contains("\"round\":0"))
    assert(manifest.contains("\"scheduled\":"))
    assert(manifest.contains("\"lineage\":["))
  }

  test("url canonicalization rules") {
    val base = "https://ex.com/dir/page.html"
    assert(UrlCanon.canonicalize("HTTPS://EX.com:443/a/../b#f", null) == "https://ex.com/b")
    assert(UrlCanon.canonicalize("child", base) == "https://ex.com/dir/child")
    assert(UrlCanon.canonicalize("/rooted?q=1", base) == "https://ex.com/rooted?q=1")
    assert(UrlCanon.canonicalize("http://ex.com:8080/x", null) == "http://ex.com:8080/x")
    assert(UrlCanon.canonicalize("http://ex.com", null) == "http://ex.com/")
    assert(UrlCanon.canonicalize("mailto:a@b", base) == null)
    assert(UrlCanon.canonicalize("javascript:void(0)", base) == null)
    assert(UrlCanon.canonicalize("#anchor", base) == null)
    assert(UrlCanon.canonicalize("//cdn.ex.com/lib.js", base) == "https://cdn.ex.com/lib.js")
    assert(UrlCanon.host("https://a.B.com/x") == "a.b.com")
  }
}
