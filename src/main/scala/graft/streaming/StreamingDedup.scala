package graft.streaming

import org.apache.spark.sql.DataFrame

/**
 * Streaming near-duplicate detection: documents arrive as an unbounded
 * stream and every micro-batch is deduped against the FULL stream history
 * via the persisted MinHash signature table
 * ([[graft.pipeline.TextPipeline.minhashPairsIncremental]]) — the streaming
 * face of the incremental dedup operator, composed as a `foreachBatch`
 * sink. The union of per-batch pair outputs equals the batch
 * `minhashPairs` over the whole corpus (PipelineSpec equality gate; the
 * reference has no streaming layer — this is the crawl-scale new
 * construction SURVEY §2 documents).
 *
 * Exactly-once: both the signature write and the pair output are keyed by
 * micro-batch id and OVERWRITTEN (`batchTag`), and the signature read
 * excludes the running batch's own tag — a replayed micro-batch (failure
 * recovery re-runs the last uncommitted batch) reads exactly the
 * pre-failure history and rewrites the same two directories, instead of
 * double-appending signatures and duplicating pairs (spec-gated by a
 * deliberate double invocation).
 *
 * Scale shape is the incremental operator's: per-word hashing over the
 * micro-batch only, stored bands left-semi-pruned to the batch's band
 * keys, spillable per-key cap — per-batch cost is proportional to the
 * batch plus touched history keys, never the full history.
 */
object StreamingDedup {

  /** `writeStream.foreachBatch` sink: near-dup pairs of each micro-batch
    * vs the stream history → `outDir/b<batchId>` (overwrite = replay-safe).
    * `batch` must carry (doc_id, text) — the minhash corpus shape. */
  def minhashSink(sigDir: String, outDir: String, minJ: Double)
      : (DataFrame, Long) => Unit = { (batch, batchId) =>
    graft.pipeline.TextPipeline
      .minhashPairsIncremental(batch, sigDir, minJ, batchTag = Some(s"b$batchId"))
      .write.mode("overwrite").parquet(s"$outDir/b$batchId")
  }
}
