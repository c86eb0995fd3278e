package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming crawl-frontier ingestion: discovered links arrive as an unbounded
 * stream and the per-host URL-seen set lives in the Structured Streaming
 * state store — the streaming analog of [[graft.crawl.Frontier.filterUnseen]]
 * (north_rule: URL-seen dedup), built on
 * `KeyValueGroupedDataset.flatMapGroupsWithState`.
 *
 * Scale design: state is keyed by host, so it shards with the host hash
 * across executors and is checkpointed/recovered by the engine; per-url
 * state is a fixed-width 64-bit hash (a production deployment swaps the
 * in-state Set for a per-host cuckoo filter segment when a single host's
 * history outgrows memory, same as the batch layer's bloom prefilter).
 */
object StreamingFrontier {

  case class Discovered(url: String, host: String, priority: Int, seq: Long)
  case class HostSeen(seen: Set[Long])

  /** FNV-1a 64-bit (public-domain constants): deterministic fixed-width url
    * fingerprint for the state store. */
  def hash64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Exactly-once first-seen emission across micro-batches. Within a batch,
    * rows process in (seq, url) order so output is deterministic regardless
    * of arrival order. */
  def firstSeen(links: Dataset[Discovered]): Dataset[Discovered] = {
    implicit val de: Encoder[Discovered] = Encoders.product[Discovered]
    implicit val he: Encoder[HostSeen] = Encoders.product[HostSeen]
    implicit val se: Encoder[String] = Encoders.STRING
    links
      .groupByKey(_.host)
      .flatMapGroupsWithState[HostSeen, Discovered](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[Discovered], state: GroupState[HostSeen]) =>
          var seen = state.getOption.map(_.seen).getOrElse(Set.empty[Long])
          val out = scala.collection.mutable.ArrayBuffer[Discovered]()
          rows.toSeq.sortBy(r => (r.seq, r.url)).foreach { r =>
            val h = hash64(r.url)
            if (!seen.contains(h)) {
              seen += h
              out += r
            }
          }
          state.update(HostSeen(seen))
          out.iterator
      }
  }
}
