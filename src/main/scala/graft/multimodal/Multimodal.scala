package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §7.5): media payloads as opaque
  * binary columns with typed metadata, batch-shaped decode / feature
  * extraction over partitions. The reference's video plane (Scanner
  * pipelines, app/esper/scannerutil.py) produced per-frame features
  * from decoded video; here the Spark-side contract — schema,
  * partitioning, per-partition batching — is real, while the codec call
  * itself is STUBBED (no image/audio libs in this container) with a
  * deterministic fake so tests can assert end-to-end shape.
  */
object Multimodal {

  /** Typed metadata for an opaque media payload. */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                           checksum: Long, feature: Array[Float])

  /** Attach a binary payload column (here: utf-8 of a text column —
    * stand-in for image/audio bytes). */
  def asMedia(df: DataFrame, idCol: String, textCol: String, kind: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"), lit(kind).as("kind"),
      col(textCol).cast("binary").as("payload"))

  /** STUB decode: a real implementation would hand each partition's
    * payload batch to a codec (JNI/FFI) and emit fixed-width feature
    * vectors; the deterministic fake derives an 8-float "feature" from
    * byte statistics so the distributed plumbing (mapPartitions batch
    * shape, schema, partition parallelism) is fully exercised.
    */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // batch boundary: a codec would be initialized once per partition
      rows.map { r =>
        val bytes = r.payload
        var csum = 0L
        var i = 0
        while (i < bytes.length) { csum = (csum * 31 + (bytes(i) & 0xff)) % 1000000007L; i += 1 }
        val feat = Array.tabulate(8) { j =>
          var acc = 0L
          var k = j
          while (k < bytes.length) { acc += (bytes(k) & 0xff); k += 8 }
          acc.toFloat / math.max(bytes.length, 1)
        }
        MediaFeatures(r.media_id, r.kind, bytes.length, csum, feat)
      }
    }
  }

  /** Frame-sample analogue (the 1-frame-per-3s sampling,
    * spark_util.py:402-405): one row per sampled frame offset plus a
    * per-frame probe value — the partition-parallel explode a real
    * decoder would consume, with the decode itself stubbed as a byte
    * probe (honest stand-in, same as [[decodeFeatures]]). */
  /** Shared offset tiling: one row per offset in [0, len) stepped by
    * `step`, with the stubbed byte probe at the offset. The empty-
    * payload guard matters: sequence(0, -1) throws in Spark where the
    * oracle's generate_series yields the empty set — the `when` makes
    * explode drop the row instead. */
  private def tile(media: DataFrame, step: Int, offName: String): DataFrame = {
    require(step >= 1)
    val len = octet_length(col("payload"))
    media
      .select(col("media_id"), col("kind"), col("payload"),
        explode(when(len > 0, sequence(lit(0), len - 1, lit(step)))
          .otherwise(array())).as(offName))
      .withColumn("probe",
        expr(s"ascii(substr(CAST(payload AS STRING), $offName + 1, 1))"))
  }

  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    tile(media, stride, "frame_off")
      .select(col("media_id"), col("kind"), col("frame_off"), col("probe"))

  /** Overlapping-window sampling (the audio-chunking shape: ASR/feature
    * pipelines consume fixed-length windows advanced by a hop smaller
    * than the window). One row per window with its clipped byte bounds
    * and a stubbed probe (first byte of the window — same honest codec
    * stand-in as [[sampleFrames]]). Windows start at every multiple of
    * `hop` before the payload end; `win >= hop` gives the standard
    * overlapped tiling. */
  def sampleWindows(media: DataFrame, win: Int, hop: Int): DataFrame = {
    require(win >= 1)
    tile(media, hop, "w_start")
      .select(col("media_id"), col("kind"), col("w_start"),
        least(col("w_start") + win,
          octet_length(col("payload")).cast("long")).as("w_end"),
        col("probe"))
  }
}
