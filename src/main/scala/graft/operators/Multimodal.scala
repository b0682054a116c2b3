package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing (SURVEY §7.4): media payloads ride through
  * the engine as opaque `binary` columns with a typed metadata struct; the
  * decode/feature-extract step is a per-partition batch transform whose
  * Spark-side shape (schema, partitioning, batch iteration) is real and
  * tested, while the actual codec call is STUBBED with a deterministic
  * fake — the container ships no image/audio libraries (builder brief).
  *
  * At scale: payload bytes stay columnar (parquet binary), metadata columns
  * support predicate pushdown (e.g. filter media_type/width without
  * touching payload bytes thanks to parquet column pruning), and decode
  * parallelism is partition-level via `mapPartitions`.
  */
object Multimodal {

  final case class MediaRow(
      doc_id: Long,
      media_type: String,
      payload: Array[Byte],
      width: Int,
      height: Int)

  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Int,
      features: Array[Float])

  /** Build a media table from the documents fixture: text encoded to bytes
    * stands in for image/audio payloads; metadata derived deterministically
    * so tests are stable.
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "image/png")
        .when(col("doc_id") % 3 === 1, "audio/wav")
        .otherwise("video/mp4").as("media_type"),
      encode(col("text"), "UTF-8").as("payload"),
      (col("doc_id") % 640 + 64).cast("int").as("width"),
      (col("doc_id") % 480 + 48).cast("int").as("height"))

  /** STUB — deterministic fake decode. A real deployment replaces this with
    * a codec call (e.g. javax.imageio / ffmpeg bindings); everything around
    * it — batch iteration, output schema, partition parallelism — is the
    * production plumbing. The fake derives `dim` floats from the payload
    * bytes with the engine's stable hash, so results are reproducible.
    */
  private[operators] def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      val h = graft.functions.StableHash64.hashBytes(payload, i.toLong)
      out(i) = ((h >>> 11).toDouble / (1L << 53).toDouble).toFloat
      i += 1
    }
    out
  }

  /** Per-partition batch decode/feature-extract — the Scala analogue of a
    * pandas-batch UDF: one iterator per partition, rows processed in a
    * tight loop, output re-enters Catalyst as a typed Dataset.
    */
  def extractFeatures(media: DataFrame, dim: Int = 8): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media_type", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, mt, payload) =>
          MediaFeatures(id, mt, payload.length, decodeStub(payload, dim))
        }
      }
  }

  /** Frame sampling stub for video payloads: pick `n` deterministic byte
    * offsets ("frames") per payload — the partition/batch shape of a real
    * frame sampler, minus the codec.
    */
  def sampleFrames(media: DataFrame, n: Int = 4): DataFrame =
    media
      .filter(col("media_type") === "video/mp4")
      .withColumn("frame_offsets",
        transform(sequence(lit(0), lit(n - 1)),
          i => (i * octet_length(col("payload"))) / n))
      .select(col("doc_id"), col("frame_offsets"))

  /** The oracle-checkable slice of the multimodal surface: metadata +
    * payload byte length (binary column exercised end-to-end; no stub in
    * the query path).
    */
  def metaQuery(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir).select(
      col("doc_id"),
      col("media_type"),
      octet_length(col("payload")).as("n_bytes"),
      col("width"),
      col("height"))
}
