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
  case class RoundResult(scheduled: Vector[Url], slots: Map[String, Int])

  private val ord: Ordering[Url] =
    Ordering.by((u: Url) => (-u.priority, u.seq, u.url))

  /** One round over the in-memory frontier; mutates `seen`. */
  def round(frontier: Seq[Url], seen: mutable.Set[String], budgetPerHost: Int)
      : (RoundResult, Vector[Url]) = {
    // 1. candidate dedup: by url, keep (max priority, min seq)
    val dedup = frontier.groupBy(_.url).map { case (url, us) =>
      Url(url, us.head.host, us.map(_.priority).max, us.map(_.seq).min)
    }.toVector
    // 2. seen filter
    val unseen = dedup.filterNot(u => seen.contains(u.url))
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
    // 5. update seen; deferred = unseen not scheduled
    scheduledSet.foreach(u => seen += u.url)
    val schedUrls = scheduledSet.map(_.url).toSet
    val deferred = unseen.filterNot(u => schedUrls.contains(u.url))
    (RoundResult(globallyOrdered, slots), deferred)
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
