package graft.crawl

import scala.collection.mutable

/**
 * Single-threaded, reference-faithful crawl model — the equality oracle for
 * crawl ordering + URL-seen membership (north_rule: "matching the reference's
 * crawl ordering and URL-seen set under the same seed list + politeness
 * budget"). The distributed [[Frontier]] must produce EXACTLY this scheduled
 * sequence and seen set for the same inputs; tests assert it round by round.
 */
object OracleCrawler {

  case class Url(url: String, host: String, priority: Int, seq: Long)
  case class Robots(disallowPrefixes: Seq[String], crawlDelayS: Int,
      allowPrefixes: Seq[String] = Nil)
  case class RoundResult(scheduled: Vector[Url], slots: Map[String, Int],
      readyS: Map[String, Long] = Map.empty)

  private val ord: Ordering[Url] =
    Ordering.by((u: Url) => (-u.priority, u.seq, u.url))

  /** One round over the in-memory frontier; mutates `seen`. */
  def round(frontier: Seq[Url], seen: mutable.Set[String], budgetPerHost: Int,
      robots: Map[String, Robots] = Map.empty)
      : (RoundResult, Vector[Url]) = {
    // 1. candidate dedup: by url, keep (max priority, min seq)
    val dedup = frontier.groupBy(_.url).map { case (url, us) =>
      Url(url, us.head.host, us.map(_.priority).max, us.map(_.seq).min)
    }.toVector
    // 2. seen filter
    val unseenAll = dedup.filterNot(u => seen.contains(u.url))
    // 2b. robots gate: path-prefix disallow; disallowed become seen forever
    val unseen =
      if (robots.isEmpty) unseenAll
      else unseenAll.filter { u =>
        robots.get(u.host) match {
          case Some(r) if r.disallowPrefixes.nonEmpty =>
            // path = url minus scheme://authority (authority may carry :port)
            val path = u.url.replaceFirst("^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", "")
            // longest-match with Allow precedence (Allow wins ties)
            val disLen = r.disallowPrefixes.filter(path.startsWith).map(_.length)
              .maxOption
            val alwLen = r.allowPrefixes.filter(path.startsWith).map(_.length)
              .maxOption
            val allowed = disLen.isEmpty ||
              alwLen.exists(_ >= disLen.get)
            if (!allowed) seen += u.url
            allowed
          case _ => true
        }
      }
    // 3. politeness: top-B per host by (priority desc, seq, url)
    val byHost = unseen.groupBy(_.host)
    val scheduledSet = byHost.flatMap { case (_, us) =>
      us.sorted(ord).take(budgetPerHost)
    }.toVector
    // 4. global order + per-host slots
    val globallyOrdered = scheduledSet.sorted(ord)
    val slotCounters = mutable.Map[String, Int]().withDefaultValue(0)
    val slots = globallyOrdered.map { u =>
      val s = slotCounters(u.host)
      slotCounters(u.host) = s + 1
      u.url -> s
    }.toMap
    // token-bucket: slot × the host's crawl delay (default 1s)
    val readyS = globallyOrdered.map { u =>
      u.url -> slots(u.url).toLong * robots.get(u.host).map(_.crawlDelayS).getOrElse(1)
    }.toMap
    // 5. update seen; deferred = unseen not scheduled
    scheduledSet.foreach(u => seen += u.url)
    val schedUrls = scheduledSet.map(_.url).toSet
    val deferred = unseen.filterNot(u => schedUrls.contains(u.url))
    (RoundResult(globallyOrdered, slots, readyS), deferred)
  }

  /** Multi-round crawl with deterministic discovery expansion. */
  def crawl(seed: Seq[Url], rounds: Int, budgetPerHost: Int,
      discover: Vector[Url] => Seq[Url] = _ => Nil)
      : (Vector[RoundResult], Set[String]) = {
    val seen = mutable.Set[String]()
    var frontier: Seq[Url] = seed
    val out = mutable.ListBuffer[RoundResult]()
    var r = 0
    while (r < rounds && frontier.nonEmpty) {
      val (res, deferred) = round(frontier, seen, budgetPerHost)
      out += res
      frontier = deferred ++ discover(res.scheduled)
      r += 1
    }
    (out.toVector, seen.toSet)
  }
}
