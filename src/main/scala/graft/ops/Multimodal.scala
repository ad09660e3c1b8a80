package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus per-partition batch decode.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked DETERMINISTIC STUB (features derived from the md5 of
  * the bytes). Everything around it is the real production shape:
  *  - binary payload + (media_type, byte_len) metadata columns;
  *  - a columnar fast path (`withStubFeatures`) whose md5-based fake
  *    stays fully codegen'd and oracle-checkable;
  *  - a `mapPartitions` path (`decodePartitions`) with the iterator
  *    batch shape a real decoder needs (load model/codec once per
  *    partition, stream records through) — swap `stubDecode` for a
  *    JNI/FFI decoder and the plumbing is unchanged;
  *  - `repartition` sizing so each partition's batch fits decoder
  *    memory (at 100 TB, partition by byte budget not row count).
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, media_type: String, content: Array[Byte])
  case class DecodedRecord(
      doc_id: Long, media_type: String, byte_len: Long,
      width: Int, height: Int, features: Array[Float])

  /** Wrap a text table as fake media rows (payload = utf8 bytes):
    * gives the binary-column schema the real pipeline would read from
    * object storage.
    */
  def asMedia(docs: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame =
    docs.select(
      col(id).cast("long").as("doc_id"),
      (when(col(id) % 3 === 0, "image")
        .when(col(id) % 3 === 1, "audio")
        .otherwise("video")).as("media_type"),
      encode(col(text), "UTF-8").as("content"))

  // ----- STUB decode kernel -------------------------------------------
  // A real implementation calls an image/audio codec here. The stub is
  // deterministic arithmetic over md5(content) so specs and the DuckDB
  // oracle can pin the plumbing end-to-end.

  /** Columnar stub: metadata + fake decode entirely in column math. */
  def withStubFeatures(media: DataFrame, featureDims: Int = 4): DataFrame = {
    val h = Hashing.hex64(col("content"))
    val feats = (0 until featureDims).map { i =>
      (((h + lit(i * 7919L)) % 1000L).cast("double") / 1000.0).as(s"f$i")
    }
    media
      .withColumn("byte_len", length(col("content")).cast("long"))
      .withColumn("width", (lit(16L) + Hashing.hex64(col("content")) % 1905L).cast("int"))
      .withColumn("height", (lit(16L) + Hashing.hex64(reverse(col("content"))) % 1065L).cast("int"))
      .select((Seq(col("doc_id"), col("media_type"), col("byte_len"),
        col("width"), col("height")) ++ feats): _*)
  }

  /** STUB for the per-record decode a real codec would perform.
    * Arithmetic matches [[withStubFeatures]] exactly (same md5-derived
    * width/height/features) so the two decode paths are interchangeable
    * and both validate against the same oracle.
    */
  def stubDecode(rec: MediaRecord): DecodedRecord = {
    val h = graft.functions.Md5Hex64Math.hashBytes(rec.content)
    val hr = graft.functions.Md5Hex64Math.hashBytes(rec.content.reverse)
    DecodedRecord(
      rec.doc_id, rec.media_type, rec.content.length.toLong,
      (16L + h % 1905L).toInt, (16L + hr % 1065L).toInt,
      Array.tabulate(4)(i => (((h + i * 7919L) % 1000L) / 1000.0).toFloat))
  }

  /** The real decoder shape: one heavyweight init per partition, then
    * stream the records through it. numPartitions sizes decode batches.
    */
  def decodePartitions(media: Dataset[MediaRecord], numPartitions: Int): Dataset[DecodedRecord] = {
    implicit val enc = Encoders.product[DecodedRecord]
    media.repartition(numPartitions).mapPartitions { it =>
      // real code: val codec = Codec.load() — once per partition
      it.map(stubDecode)
    }
  }

  /** Resize plumbing: rescale decoded dimensions to fit a bounding box
    * preserving aspect ratio (the metadata transform of a real resize;
    * the pixel kernel is the decoder's job). Pure column math over the
    * decoded table — stays codegen'd, no data movement.
    */
  def withResize(decoded: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(
      lit(maxW).cast("double") / col("width"),
      lit(maxH).cast("double") / col("height"),
      lit(1.0))
    decoded
      .withColumn("resized_w", greatest(floor(col("width") * scale), lit(1)).cast("int"))
      .withColumn("resized_h", greatest(floor(col("height") * scale), lit(1)).cast("int"))
  }

  /** Frame sampling: explode a video payload into every `stride`-th
    * fixed-size chunk ("frame"), keyed (doc_id, frame_no). The chunking
    * is the STUB for codec frame extraction; the generator shape —
    * explode bounded by payload size, one output row per sampled frame,
    * shuffle key (doc_id) — is the real pipeline's. At 100 TB the
    * explode multiplies rows by frames-per-video, so repartition by id
    * first (same rationale as Dedup.shingleRows).
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes > 0 && stride > 0)
    val nFrames = ceil(length(col("content")).cast("double") / frameBytes).cast("int")
    media
      .where(col("media_type") === "video")
      // zero-length payloads have no frames (sequence(0, 0) would
      // otherwise emit one spurious empty frame)
      .where(length(col("content")) > 0)
      .repartition(media.sparkSession.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"),
        explode(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride))).as("frame_no"),
        col("content"))
      .select(col("doc_id"), col("frame_no"),
        col("content").substr(col("frame_no") * frameBytes + 1, lit(frameBytes))
          .as("frame_bytes"))
      .withColumn("frame_len", length(col("frame_bytes")).cast("long"))
  }
}
