package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal columns: image/audio/video payloads ride as opaque `BINARY`
 * columns with typed metadata structs (the `media_ref` leg of the interleaved
 * document model, BASELINE.json input_hint). The decode step is a
 * >>> DETERMINISTIC STUB <<< — this container has no image/audio codecs; in
 * production the decode body is replaced by a real codec invoked per batch
 * (PySpark: pandas UDF over mapInPandas; Scala: the same mapPartitions batch
 * shape used here). Everything around the stub — schema, batching,
 * partitioning, metadata plumbing — is real and tested.
 */
object Multimodal {

  /** Synthesized media table from `documents`: deterministic payload bytes +
    * typed metadata, SQL-expressible on both engines. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.select(
      col("doc_id"),
      expr("""CASE doc_id % 3 WHEN 0 THEN concat('img-', doc_id)
              WHEN 1 THEN concat('aud-', doc_id)
              ELSE concat('vid-', doc_id) END""").as("media_ref"),
      expr("""CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END""").as("media_type"),
      // opaque payload: utf-8 bytes of a deterministic string
      expr("encode(concat('payload-', doc_id, '-', repeat('x', cast(doc_id % 50 as int))), 'utf-8')")
        .as("payload"),
      struct(
        expr("cast(64 + (doc_id % 16) * 32 as int)").as("width"),
        expr("cast(64 + (doc_id % 9) * 32 as int)").as("height"),
        expr("cast(doc_id % 300 as int)").as("duration_s"),
        expr("""CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'wav'
                ELSE 'mp4' END""").as("format")).as("meta"))
  }

  /**
   * Decode/feature-extract over payload batches. STUB: emits a deterministic
   * fake "decode" (byte checksum + derived dims) instead of real pixels —
   * marked per task instructions; the Spark-side plumbing (binary in, struct
   * out, per-partition batching) is the real shape a codec UDF would use.
   */
  val decodeStub: Array[Byte] => (Int, Long) = { bytes =>
    // fake decode: (n_bytes, polynomial checksum) — a real impl returns pixels
    var acc = 0L
    bytes.foreach { b => acc = (acc * 31 + (b & 0xff)) % 1000000007L }
    (bytes.length, acc)
  }

  /** Rows per decode batch: a real codec amortizes model/codec init and
    * vectorizes across a batch (the Scala analog of mapInPandas' Arrow
    * batches). */
  val DecodeBatchSize = 256

  def withDecoded(media: DataFrame): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val in = media.select(col("doc_id"), col("media_ref"), col("media_type"),
      col("meta.width").as("width"), col("meta.height").as("height"), col("payload"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("media_ref", StringType),
      StructField("media_type", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_bytes", LongType),
      StructField("checksum", LongType)))
    implicit val enc = org.apache.spark.sql.Encoders.row(outSchema)
    // per-partition, per-batch decode — the batch loop is where a real codec
    // runs once per DecodeBatchSize payloads instead of once per row
    in.mapPartitions { rows =>
      rows.grouped(DecodeBatchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val payload = if (r.isNullAt(5)) Array.empty[Byte] else r.getAs[Array[Byte]](5)
          val (n, checksum) = decodeStub(payload)
          Row(if (r.isNullAt(0)) null else r.getLong(0),
            if (r.isNullAt(1)) null else r.getString(1),
            if (r.isNullAt(2)) null else r.getString(2),
            if (r.isNullAt(3)) null else r.getInt(3),
            if (r.isNullAt(4)) null else r.getInt(4),
            n.toLong, checksum)
        }
      }
    }
  }

  /** Resize = pure metadata transform (no pixel work in the plan until the
    * sink — at 100 TB you only touch bytes in the final stage). */
  def resizePlan(media: DataFrame, maxDim: Int): DataFrame =
    media.withColumn("scale",
        expr(s"least(1.0D, $maxDim / cast(greatest(meta.width, meta.height) as double))"))
      .withColumn("out_width", expr("cast(floor(meta.width * scale) as int)"))
      .withColumn("out_height", expr("cast(floor(meta.height * scale) as int)"))

  /** Frame sampling for video refs: deterministic frame indices (1 fps up to
    * 8 frames) — the batch shape of a real frame extractor. */
  def frameSamples(media: DataFrame): DataFrame =
    media.filter(col("media_type") === "video")
      .select(col("doc_id"), col("media_ref"),
        expr("transform(sequence(0, cast(least(meta.duration_s, 7) as int)), i -> i)")
          .as("frame_indices"))
}
