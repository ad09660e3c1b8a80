package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus per-partition batch decode.
  *
  * Image and audio decode are REAL: `decodeImages` goes through
  * javax.imageio (PNG) and `decodeAudio` through javax.sound
  * (WAV/PCM) — genuine codec round trips in the per-partition batch
  * shape. Only VIDEO decode remains a clearly-marked DETERMINISTIC
  * STUB (features derived from the md5 of the bytes), because the JDK
  * ships no video codec and this container has no native ones.
  * Everything around the stub is still the real production shape:
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

  // ----- REAL image codec path ------------------------------------------
  // The JDK ships a PNG codec (javax.imageio, headless-safe), so the
  // decode kernel does NOT have to stay a stub: these two methods run a
  // real encode → binary column → real decode round trip. Payload
  // generation is deterministic arithmetic over the doc's hex64 hash —
  // pixel(x, y) = (a·x + b·y + c) mod 256 per channel — and PNG is
  // LOSSLESS, so the DuckDB oracle never decodes an image: it replays
  // the generative formula over a (doc × x × y) grid and must land on
  // the same exact integer pixel sums the decoder extracts.

  case class PngRecord(doc_id: Long, png: Array[Byte])
  case class ImageStats(doc_id: Long, width: Int, height: Int,
      n_pixels: Long, sum_r: Long, sum_g: Long, sum_b: Long)

  /** Deterministic image dimensions/coefficients from the doc hash —
    * shared by the generator and the oracle's closed replay.
    */
  private[ops] def imageParams(h: Long): (Int, Int, Long, Long, Long) = {
    val w = (16L + h % 48L).toInt
    val ht = (16L + (h / 48L) % 32L).toInt
    (w, ht, 1L + h % 251L, 1L + (h / 251L) % 241L, h % 256L)
  }

  /** Render each document's deterministic pattern as a REAL PNG
    * payload (JDK ImageIO, once per row inside mapPartitions — the
    * load-codec-once batch shape [[decodePartitions]] documents).
    * In production this stage is object-storage ingest; here it also
    * serves as the fixture generator the decode oracle can predict.
    */
  def renderPngs(docs: DataFrame, id: String = "doc_id",
      text: String = "text"): Dataset[PngRecord] = {
    implicit val enc = Encoders.product[PngRecord]
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(id).cast("long").as("doc_id"), col(text).cast("string").as("t"))
      // the single-split input trap (see stageParquet doc): per-row
      // codec work on a one-file table runs in ONE task without this
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (docId, t) =>
          val h = graft.functions.Md5Hex64Math.hashBytes(
            t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          val (w, ht, a, b, c) = imageParams(h)
          val img = new java.awt.image.BufferedImage(
            w, ht, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < ht) {
            var x = 0
            while (x < w) {
              val r = ((a * x + b * y + c) % 256L).toInt
              val g = ((a * x + b * y + c + 85L) % 256L).toInt
              val bl = ((a * x + b * y + c + 170L) % 256L).toInt
              img.setRGB(x, y, (r << 16) | (g << 8) | bl)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          PngRecord(docId, bos.toByteArray)
        }
      }
  }

  // ----- REAL audio codec path ------------------------------------------
  // Same pattern for audio: the JDK reads WAV/PCM via
  // javax.sound.sampled. Payloads are canonical 44-byte-header RIFF
  // containers around deterministic signed-16-bit samples
  // s(t) = ((a·t + c) mod 65536) − 32768, and PCM is lossless, so the
  // oracle replays the sample formula over a (doc × t) grid. Only
  // video remains a stub — the JDK ships no video codec.

  case class WavRecord(doc_id: Long, wav: Array[Byte])
  case class AudioStats(doc_id: Long, sample_rate: Int, n_samples: Long,
      sum_amp: Long, sum_abs: Long)

  /** Deterministic sample count/coefficients from the doc hash —
    * shared by the generator and the oracle's replay.
    */
  private[ops] def audioParams(h: Long): (Int, Long, Long) =
    ((256L + h % 512L).toInt, 1L + h % 8191L, h % 65536L)

  /** Render each document's deterministic PCM pattern as a REAL WAV
    * payload (canonical RIFF header + 16-bit mono LE samples).
    */
  def renderWavs(docs: DataFrame, id: String = "doc_id",
      text: String = "text"): Dataset[WavRecord] = {
    implicit val enc = Encoders.product[WavRecord]
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(id).cast("long").as("doc_id"), col(text).cast("string").as("t"))
      // single-split trap, as in renderPngs
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (docId, t) =>
          val h = graft.functions.Md5Hex64Math.hashBytes(
            t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          val (n, a, c) = audioParams(h)
          val dataSize = n * 2
          val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
            .put("WAVE".getBytes("US-ASCII"))
            .put("fmt ".getBytes("US-ASCII")).putInt(16)
            .putShort(1).putShort(1)            // PCM, mono
            .putInt(8000).putInt(16000)         // sample rate, byte rate
            .putShort(2).putShort(16)           // block align, bits
            .put("data".getBytes("US-ASCII")).putInt(dataSize)
          var t0 = 0L
          while (t0 < n) {
            bb.putShort((((a * t0 + c) % 65536L) - 32768L).toShort)
            t0 += 1
          }
          WavRecord(docId, bb.array())
        }
      }
  }

  /** REAL audio decode: javax.sound.sampled parses the WAV container
    * (format validated — signed 16-bit mono PCM), samples stream out
    * of the AudioInputStream, and the statistics are exact integer
    * sums — engine-bit-identical like [[decodeImages]].
    */
  def decodeAudio(media: Dataset[WavRecord]): Dataset[AudioStats] = {
    implicit val enc = Encoders.product[AudioStats]
    media.mapPartitions { it =>
      it.map { rec =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(rec.wav))
        val f = in.getFormat
        require(f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
            && f.getSampleSizeInBits == 16 && f.getChannels == 1,
          s"doc ${rec.doc_id}: not 16-bit mono PCM ($f)")
        val bytes = in.readAllBytes()
        in.close()
        var (i, sum, sabs) = (0, 0L, 0L)
        while (i + 1 < bytes.length) {
          val lo = bytes(i) & 0xff
          val hi = bytes(i + 1).toInt // sign-extends: WAV PCM16 is LE signed
          val s = if (f.isBigEndian) ((lo << 8) | (hi & 0xff)).toShort.toInt
            else ((hi << 8) | lo).toShort.toInt
          sum += s
          sabs += math.abs(s)
          i += 2
        }
        AudioStats(rec.doc_id, f.getSampleRate.toInt, bytes.length / 2, sum, sabs)
      }
    }
  }

  /** REAL decode: ImageIO.read each PNG payload (codec loaded once per
    * JVM; records stream through mapPartitions exactly like
    * [[decodePartitions]]) and extract exact integer statistics —
    * width, height, per-channel pixel sums. Integer sums, not float
    * means: engine-bit-identical on any engine, any partitioning.
    */
  def decodeImages(media: Dataset[PngRecord]): Dataset[ImageStats] = {
    implicit val enc = Encoders.product[ImageStats]
    media.mapPartitions { it =>
      it.map { rec =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(rec.png))
        require(img != null, s"doc ${rec.doc_id}: payload is not a decodable image")
        val (w, h) = (img.getWidth, img.getHeight)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xff
            sg += (rgb >> 8) & 0xff
            sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        ImageStats(rec.doc_id, w, h, w.toLong * h, sr, sg, sb)
      }
    }
  }
}
