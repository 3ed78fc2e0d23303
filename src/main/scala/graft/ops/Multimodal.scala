package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** decoded-feature row a real media decoder would emit */
case class Decoded(doc_id: Long, width: Int, height: Int, feature: Seq[Float])

/** an ingested image row: opaque encoded bytes + typed id */
case class ImagePayload(doc_id: Long, payload: Array[Byte])

/** real decode output: true dimensions + per-channel mean intensity
  * in [0,1] (the simplest genuine pixel-derived feature)
  */
case class DecodedImage(doc_id: Long, width: Int, height: Int,
                        mean_r: Double, mean_g: Double, mean_b: Double)

/** one sampled frame from a multi-frame payload */
case class FramePayload(doc_id: Long, frame_idx: Long, frame: Array[Byte])

/** an ingested audio row: opaque encoded bytes + typed id */
case class AudioPayload(doc_id: Long, payload: Array[Byte])

/** real audio decode output: container format + PCM sample stats */
case class DecodedAudio(doc_id: Long, sample_rate: Long, n_samples: Long,
                        duration_s: Double, peak: Long, rms: Double)

/** one analysis frame of a decoded audio stream: integer-exact
  * zero-crossing count, energy (Σ s²) and peak */
case class AudioFrame(doc_id: Long, frame_no: Long, n: Long, zc: Long,
                      energy: Long, peak: Long)

/** one non-empty histogram bucket of a decoded image channel */
case class ImageFeature(doc_id: Long, channel: String, bin: Int, n_px: Long)

case class ImagePhash(doc_id: Long, phash: String)

/** decoded frame: (doc, frame) key + true dimensions and pixel means */
case class DecodedFrame(doc_id: Long, frame_idx: Long, width: Int, height: Int,
                        mean_r: Double, mean_g: Double, mean_b: Double)

/** Multimodal column plumbing (SURVEY §2c.34): image/audio/video as
  * opaque `binary` payload columns with typed metadata.
  *
  * The Spark-side shape is the real deliverable: payloads stay
  * columnar in parquet, metadata columns are prunable without
  * touching payload bytes, and decode/feature-extract runs batched
  * per partition (the Scala analog of arrow-batched UDFs). The
  * actual media decoder is STUBBED (no image/audio libs in this
  * environment) behind [[stubDecode]] — a deterministic fake with
  * the same signature a real decoder would have.
  */
object Multimodal {

  /** ImageIO defaults to a DISK-backed stream cache: every read/write
    * spills the encoded bytes through a temp file — per image. For
    * in-memory byte-array payloads that is pure overhead (a file
    * create+delete per decode); reference once per executor JVM from
    * each codec closure to switch to memory-backed streams.
    */
  @transient private lazy val imageIoNoDiskCache: Boolean = {
    javax.imageio.ImageIO.setUseCache(false); true
  }

  /** per-channel pixel sums of a decoded raster via BULK row reads:
    * `getRGB(0,y,w,1,row,0,w)` converts one scanline per call instead
    * of re-dispatching through the ColorModel for every pixel — the
    * per-pixel `getRGB(x,y)` spelling is the dominant cost of a decode
    * walk on any non-trivial image (~3-5× slower than the row bulk).
    */
  private def channelSums(
      img: java.awt.image.BufferedImage): (Long, Long, Long) = {
    val w = img.getWidth; val h = img.getHeight
    val row = new Array[Int](w)
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val p = row(x)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
        x += 1
      }
      y += 1
    }
    (sr, sg, sb)
  }

  /** wrap a text corpus as a payload table: (doc_id, payload binary,
    * meta struct<n_bytes, content_md5>) — the schema any real media
    * ingest would produce.
    */
  def asPayload(df: DataFrame, text: Column, id: Column): DataFrame =
    df.select(
      id.as("doc_id"),
      text.cast("binary").as("payload"),
      struct(
        octet_length(text.cast("binary")).as("n_bytes"),
        md5(text.cast("binary")).as("content_md5")).as("meta"))

  /** metadata-only projection — must NOT read payload bytes (column
    * pruning reaches the parquet scan; verify via .explain ReadSchema).
    */
  def metaOnly(payloads: DataFrame): DataFrame =
    payloads.select(col("doc_id"), col("meta.n_bytes").as("n_bytes"),
      col("meta.content_md5").as("content_md5"))
      .orderBy("doc_id")

  /** feature schema a real decoder would emit */
  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("feature", ArrayType(FloatType))))

  /** STUB decoder: deterministic fake features derived from payload
    * bytes (length + first bytes). Batch-shaped: one call per
    * partition iterator, as a real decoder (which would hold a
    * native context per partition) requires. Replace the body with
    * the real decode; the plumbing — partition batching, schema,
    * pruning — is what this module actually tests.
    */
  /** REAL image resize: decode → scale onto a w×h raster (JDK
    * Graphics2D, headless-safe offscreen draw) → re-encode PNG.
    * Batch-shaped typed mapPartitions like [[decodeImages]];
    * undecodable payloads pass through unchanged (tag-and-continue,
    * not abort). Output schema matches the ingest schema (doc_id,
    * payload), so resize composes with decode/feature stages —
    * the decode(resize(x)) chain is oracle-checked end to end.
    */
  def resizeImages(payloads: DataFrame, w: Int, h: Int): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        imageIoNoDiskCache
        it.map { case (id, bytes) =>
          val img =
            if (bytes == null || bytes.isEmpty) null
            else
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
              catch { case _: java.io.IOException => null }
          if (img == null) ImagePayload(id, bytes)
          else {
            val out = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            g.drawImage(img, 0, 0, w, h, null)
            g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            ImagePayload(id, bos.toByteArray)
          }
        }
      }
      .toDF()
  }

  def stubDecode(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        imageIoNoDiskCache
        // one iterator per partition: the shape a real decoder (native
        // context, batched I/O) requires; stays in the typed Dataset
        // world so downstream ops keep the Encoder
        it.map { case (id, bytes) =>
          val w = 16 + (bytes.length % 16)
          val h = 16 + (math.abs(id) % 16).toInt
          val feat = Array.tabulate(8)(i =>
            (if (bytes.length > i) bytes(i).toFloat else 0f) / 255f)
          Decoded(id, w, h, feat.toSeq)
        }
      }
      .toDF()
  }

  /** Deterministic REAL PNG payload per row: a solid-colour image
    * whose dimensions and colour are pure functions of doc_id, encoded
    * through `javax.imageio` (JDK built-in — no external media dep).
    * This is the ingest half of a genuine encode→decode round trip:
    * the bytes on the wire are a true PNG stream, so [[decodeImages]]
    * exercises a real codec, and the expected width/height/colour are
    * SQL-computable — the decode is oracle-checkable, not fabricated.
    * Batch-shaped like any real media ingest (one iterator per
    * partition; an encoder context could be hoisted per partition).
    */
  def syntheticImagePayload(df: DataFrame, id: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long")).as[Long].mapPartitions { it =>
        imageIoNoDiskCache
      it.map { docId =>
        val w = 16 + (docId % 16).toInt
        val h = 16 + ((docId / 16) % 16).toInt
        val r = (docId % 256).toInt
        val g = ((docId * 7) % 256).toInt
        val b = ((docId * 13) % 256).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val rgb = (r << 16) | (g << 8) | b
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        ImagePayload(docId, bos.toByteArray)
      }
    }.toDF()
  }

  /** Deterministic 9×8 grayscale-gradient PNG payloads — the input
    * shape for [[dHashes]]. Pixel gray g(x,y) = (x·a + y·b) mod 200
    * + jitter, where the gradient slopes (a, b) are functions of the
    * STYLE key doc_id % 16 and the jitter is a per-doc GLOBAL
    * brightness shift (doc_id·31 mod 16). Docs sharing a style key
    * render the same gradient at different brightness — the
    * "re-encoded / brightness-tweaked copy" phenomenon perceptual
    * image dedup exists for, and every pixel is a closed-form
    * function of doc_id, so the dHash route is SQL-mirrorable
    * end-to-end (the solid-colour-payload precedent, §2c.34b).
    */
  def syntheticGradientPayload(df: DataFrame, id: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long")).as[Long].mapPartitions { it =>
      imageIoNoDiskCache
      it.map { docId =>
        val k = (docId % 16).toInt
        // steep slopes: several mod-200 wraps per row, so each style
        // key's wrap positions give it a DISTINCT comparison pattern
        // (shallow slopes make every gradient monotone → one hash)
        val a = 29 + (k * 37) % 151
        val b = 11 + (k * 53) % 97
        // derived from docId/16 so it varies WITHIN a style group
        // (style has period 16; a jitter with the same period would
        // give every style-mate identical bytes, not just identical
        // hashes)
        val jit = (((docId / 16) * 7) % 16).toInt
        val img = new java.awt.image.BufferedImage(
          9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 9) {
            val g = (x * a + y * b) % 200 + jit
            img.setRGB(x, y, (g << 16) | (g << 8) | g)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        ImagePayload(docId, bos.toByteArray)
      }
    }.toDF()
  }

  /** Perceptual difference-hash (dHash) over REAL decoded images
    * (§2c.34g): for each of 8 rows, compare the 8 adjacent pixel
    * pairs of a 9-column grayscale raster — bit = left < right —
    * packing each row into one byte, the hash into 16 lowercase hex
    * chars. dHash is invariant to global brightness shifts by
    * construction (only pairwise COMPARISONS survive), which is the
    * perceptual property: a re-encoded or exposure-tweaked copy
    * collides with its original while any re-composition does not.
    * Payloads are decoded through the real `javax.imageio` codec
    * (batch-shaped mapPartitions, same contract as [[decodeImages]]);
    * images not already 9×8 would be downscaled first in a general
    * deployment — the synthetic payloads arrive at hash size, keeping
    * every bit SQL-derivable. Undecodable payloads are quarantined
    * (no hash row), the [[histogramFeatures]] convention.
    */
  def dHashes(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        imageIoNoDiskCache
        it.flatMap { case (id, bytesOrNull) =>
          val bytes = if (bytesOrNull == null) Array.empty[Byte] else bytesOrNull
          val img =
            if (bytes.isEmpty) null
            else
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
              catch { case _: java.io.IOException => null }
          if (img == null || img.getWidth < 2) Iterator.empty
          else {
            val w = img.getWidth
            val h = img.getHeight
            val sb = new java.lang.StringBuilder(2 * h)
            val row = new Array[Int](w)
            var y = 0
            while (y < h) {
              img.getRGB(0, y, w, 1, row, 0, w)
              var byteAcc = 0
              var x = 0
              while (x < w - 1 && x < 8) {
                // gray = blue channel: payloads are written r=g=b
                if ((row(x) & 0xff) < (row(x + 1) & 0xff))
                  byteAcc |= 1 << x
                x += 1
              }
              sb.append(f"$byteAcc%02x")
              y += 1
            }
            Iterator.single(ImagePhash(id, sb.toString))
          }
        }
      }
      .toDF()
  }

  /** REAL image decode over a (doc_id, payload binary) frame via
    * `javax.imageio` (PNG/BMP/GIF/JPEG — whatever the JDK registry
    * handles): true width/height plus per-channel mean intensity
    * computed from the actual pixel raster. Batch-shaped typed
    * mapPartitions — the decoder streams one partition's payloads
    * through one iterator, the shape a native codec context needs.
    *
    * Payloads no registered codec can parse fall back to the same
    * deterministic fake as [[stubDecode]] (width/height from byte
    * stats, means 0) rather than failing the batch — a real pipeline
    * tags-and-quarantines undecodable media instead of aborting.
    */
  def decodeImages(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        imageIoNoDiskCache
        it.map { case (id, bytesOrNull) =>
          val bytes = if (bytesOrNull == null) Array.empty[Byte] else bytesOrNull
          val img =
            if (bytes.isEmpty) null
            else
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
              catch { case _: java.io.IOException => null }
          if (img == null) {
            DecodedImage(id, 16 + (bytes.length % 16),
              16 + (math.abs(id) % 16).toInt, 0.0, 0.0, 0.0)
          } else {
            val w = img.getWidth
            val h = img.getHeight
            val (sr, sg, sb) = channelSums(img)
            val n = w.toLong * h
            DecodedImage(id, w, h,
              sr.toDouble / n / 255.0, sg.toDouble / n / 255.0,
              sb.toDouble / n / 255.0)
          }
        }
      }
      .toDF()
  }

  /** REAL feature extraction over decoded rasters (§2c.34e): per-
    * channel intensity histogram — `bins` equal-width buckets over
    * [0,256), emitted as (doc_id, channel, bin, n_px) rows for every
    * NON-EMPTY bucket. The extract walks the actual decoded pixels
    * (same batch-shaped typed mapPartitions as [[decodeImages]]), so
    * it is the feature-extraction half of the media pipeline with a
    * real codec in front — and because the synthetic payloads are
    * solid-colour functions of doc_id, the full histogram is SQL-
    * computable and the query is hash-oracled. Undecodable payloads
    * emit no feature rows (tag-and-quarantine, consistent with a real
    * pipeline routing bad media aside rather than aborting the batch).
    */
  def histogramFeatures(payloads: DataFrame, bins: Int = 8): DataFrame = {
    require(bins > 0 && 256 % bins == 0,
      s"bins must divide 256 (1,2,4,...,256), got $bins — " +
        "a non-divisor makes the top bucket overflow the histogram")
    val spark = payloads.sparkSession
    import spark.implicits._
    val width = 256 / bins
    payloads.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        imageIoNoDiskCache
        it.flatMap { case (id, bytesOrNull) =>
          val bytes = if (bytesOrNull == null) Array.empty[Byte] else bytesOrNull
          val img =
            if (bytes.isEmpty) null
            else
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
              catch { case _: java.io.IOException => null }
          if (img == null) Iterator.empty
          else {
            val hr = new Array[Long](bins)
            val hg = new Array[Long](bins)
            val hb = new Array[Long](bins)
            val w = img.getWidth
            val row = new Array[Int](w)
            var y = 0
            while (y < img.getHeight) {
              img.getRGB(0, y, w, 1, row, 0, w)
              var x = 0
              while (x < w) {
                val p = row(x)
                hr(((p >> 16) & 0xff) / width) += 1
                hg(((p >> 8) & 0xff) / width) += 1
                hb((p & 0xff) / width) += 1
                x += 1
              }
              y += 1
            }
            Seq("r" -> hr, "g" -> hg, "b" -> hb).iterator.flatMap {
              case (ch, hist) =>
                hist.iterator.zipWithIndex.collect {
                  case (n, bin) if n > 0 => ImageFeature(id, ch, bin, n)
                }
            }
          }
        }
      }.toDF()
  }

  /** Deterministic multi-frame ("video") payload: `nFrames`
    * solid-colour PNGs per doc, concatenated with 4-byte big-endian
    * length prefixes — a real (if minimal) container format, the
    * MJPEG-style frame stream shape. Frame colour/size are pure
    * functions of (doc_id, frame_idx), so downstream sampling +
    * decode is oracle-checkable.
    */
  def syntheticVideoPayload(df: DataFrame, id: Column,
                            nFrames: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long")).as[Long].mapPartitions { it =>
        imageIoNoDiskCache
      it.map { docId =>
        val bos = new java.io.ByteArrayOutputStream()
        val out = new java.io.DataOutputStream(bos)
        var f = 0
        while (f < nFrames) {
          val w = 8 + f
          val h = 8 + (docId % 8).toInt
          val rgb = (((docId + 31 * f) % 256).toInt << 16) |
            (((docId * 7 + 17 * f) % 256).toInt << 8) |
            ((docId * 13 + 29 * f) % 256).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, rgb); x += 1 }
            y += 1
          }
          val frame = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", frame)
          out.writeInt(frame.size())
          frame.writeTo(out)
          f += 1
        }
        ImagePayload(docId, bos.toByteArray)
      }
    }.toDF()
  }

  /** REAL frame sampling over the length-prefixed frame container:
    * every `every`-th frame is extracted; the others are SKIPPED at
    * the byte level (length prefix → seek) without ever being
    * decoded — the IO-efficiency property that makes frame sampling
    * worth doing at all. Batch-shaped typed mapPartitions; malformed
    * tails are dropped, not fatal.
    */
  def sampleFrames(payloads: DataFrame, every: Int): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        imageIoNoDiskCache
        it.flatMap { case (id, bytes) =>
          val buf = java.nio.ByteBuffer.wrap(
            if (bytes == null) Array.empty[Byte] else bytes)
          val frames = scala.collection.mutable.ArrayBuffer.empty[FramePayload]
          var idx = 0L
          var ok = true
          while (ok && buf.remaining() >= 4) {
            val len = buf.getInt()
            if (len < 0 || len > buf.remaining()) ok = false
            else {
              if (idx % every == 0) {
                val frame = new Array[Byte](len)
                buf.get(frame)
                frames += FramePayload(id, idx, frame)
              } else buf.position(buf.position() + len) // skip, no copy
              idx += 1
            }
          }
          frames
        }
      }.toDF()
  }

  /** decode sampled frames — [[decodeImages]] keyed by
    * (doc_id, frame_idx)
    */
  def decodeFrames(frames: DataFrame): DataFrame = {
    val spark = frames.sparkSession
    import spark.implicits._
    frames.select("doc_id", "frame_idx", "frame")
      .as[(Long, Long, Array[Byte])]
      .mapPartitions { it =>
        imageIoNoDiskCache
        it.map { case (id, idx, bytes) =>
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: java.io.IOException => null }
          if (img == null) DecodedFrame(id, idx, -1, -1, 0.0, 0.0, 0.0)
          else {
            val w = img.getWidth
            val h = img.getHeight
            val (sr, sg, sb) = channelSums(img)
            val n = w.toLong * h
            DecodedFrame(id, idx, w, h,
              sr.toDouble / n / 255.0, sg.toDouble / n / 255.0,
              sb.toDouble / n / 255.0)
          }
        }
      }.toDF()
  }

  /** driver-checkable scalar projection of a decode: the array column
    * reduced to a stable digest (pandas cannot sort ndarray cells).
    */
  def decodeSummary(decoded: DataFrame): DataFrame =
    decoded.select(col("doc_id"),
      col("width").cast("long").as("width"),
      col("height").cast("long").as("height"),
      md5(to_binary(
        array_join(transform(col("feature"),
          f => format_string("%.6f", f)), ","), lit("utf-8"))).as("feature_md5"))

  /** Deterministic REAL WAV payload per row (§2c.34f): canonical
    * 16-bit mono PCM RIFF/WAVE bytes assembled field by field (the
    * container layout is public), carrying a full-amplitude square
    * wave at Nyquist — every sample is ±amp with
    * amp = (doc_id·37) % 10000 over n = 800 + doc_id % 800 samples at
    * 8 kHz. Every downstream stat (sample rate, count, duration,
    * peak, RMS — RMS of a square wave is exactly amp) is a pure
    * function of doc_id, so the DECODE through the JDK's real WAV
    * codec is hash-oracled, the same posture as the PNG round trip.
    */
  def syntheticAudioPayload(df: DataFrame, id: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long")).as[Long].mapPartitions { it =>
      it.map { docId =>
        val n = 800 + (docId % 800).toInt
        val amp = ((docId * 37) % 10000).toInt
        val dataLen = n * 2
        val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
          .put("WAVE".getBytes("US-ASCII"))
          .put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1)            // PCM
          .putShort(1)            // mono
          .putInt(8000)           // sample rate
          .putInt(16000)          // byte rate
          .putShort(2)            // block align
          .putShort(16)           // bits/sample
          .put("data".getBytes("US-ASCII")).putInt(dataLen)
        var i = 0
        while (i < n) {
          bb.putShort((if (i % 2 == 0) amp else -amp).toShort)
          i += 1
        }
        AudioPayload(docId, bb.array())
      }
    }.toDF()
  }

  /** REAL audio decode (§2c.34f): `javax.sound.sampled.AudioSystem`
    * parses the container (format, rate, sample width), then the PCM
    * stream is walked once for sample count, peak and RMS — the
    * feature-extraction shape of an audio ingest pipeline, batched
    * per partition like every codec here. Non-PCM-16 or unparseable
    * payloads are quarantined as a deterministic -1 row (tag-and-
    * continue), mirroring [[decodeImages]].
    */
  def decodeAudio(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytesOrNull) =>
          val bytes = if (bytesOrNull == null) Array.empty[Byte] else bytesOrNull
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val fmt = ais.getFormat
            val ok = fmt.getEncoding ==
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
              fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
              !fmt.isBigEndian
            if (!ok) DecodedAudio(id, -1L, -1L, -1.0, -1L, -1.0)
            else {
              val pcm = ais.readAllBytes()
              val n = pcm.length / 2
              var i = 0; var peak = 0L; var sumSq = 0.0
              while (i < n) {
                val s = ((pcm(2 * i + 1).toInt << 8) |
                  (pcm(2 * i) & 0xff)).toShort.toInt
                val a = math.abs(s).toLong
                if (a > peak) peak = a
                sumSq += s.toDouble * s
                i += 1
              }
              val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n)
              DecodedAudio(id, fmt.getSampleRate.toLong, n.toLong,
                n / fmt.getSampleRate.toDouble, peak, rms)
            }
          } catch {
            case _: Exception => DecodedAudio(id, -1L, -1L, -1.0, -1L, -1.0)
          }
        }
      }.toDF()
  }

  /** FRAME-LEVEL audio features (§2c.34h) — the short-time analysis
    * pass every audio ingest pipeline runs before ML (VAD, silence
    * trimming, loudness normalization): the decoded PCM stream is
    * split into `frameSamples`-sample frames (default 160 = 20 ms at
    * 8 kHz) and each frame reports INTEGER-EXACT signals — within-
    * frame zero-crossing count (sign flips between consecutive
    * samples; frame-local, so frames are independent), energy
    * (Σ s² as an exact long) and peak. No float leaves the operator,
    * so the row set hash-oracles against the closed-form mirror (the
    * [[syntheticAudioPayload]] square wave makes every frame stat a
    * pure function of doc_id: alternating ±amp ⇒ zc = n−1 when
    * amp > 0, energy = n·amp²).
    *
    * Same batch-shaped mapPartitions + quarantine contract as
    * [[decodeAudio]]: undecodable payloads yield one deterministic
    * all-−1 row. One decode pass emits all frames — the payload is
    * never re-read per frame.
    */
  def audioFrameFeatures(payloads: DataFrame,
                         frameSamples: Int = 160): DataFrame = {
    require(frameSamples > 0, s"frameSamples must be positive")
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytesOrNull) =>
          val bytes = if (bytesOrNull == null) Array.empty[Byte] else bytesOrNull
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val fmt = ais.getFormat
            val ok = fmt.getEncoding ==
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
              fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
              !fmt.isBigEndian
            if (!ok) Seq(AudioFrame(id, -1L, -1L, -1L, -1L, -1L))
            else {
              val pcm = ais.readAllBytes()
              val n = pcm.length / 2
              def sample(i: Int): Int =
                ((pcm(2 * i + 1).toInt << 8) | (pcm(2 * i) & 0xff)).toShort.toInt
              val frames = (n + frameSamples - 1) / frameSamples
              (0 until frames).map { f =>
                val s0 = f * frameSamples
                val e = math.min(s0 + frameSamples, n)
                var zc = 0L; var energy = 0L; var peak = 0L
                var prev = 0
                var i = s0
                while (i < e) {
                  val s = sample(i)
                  if (i > s0 && ((prev > 0 && s < 0) || (prev < 0 && s > 0)))
                    zc += 1
                  val a = math.abs(s).toLong
                  if (a > peak) peak = a
                  energy += s.toLong * s
                  prev = s
                  i += 1
                }
                AudioFrame(id, f.toLong, (e - s0).toLong, zc, energy, peak)
              }
            }
          } catch {
            case _: Exception => Seq(AudioFrame(id, -1L, -1L, -1L, -1L, -1L))
          }
        }
      }.toDF()
  }

  /** near-duplicate IMAGE mining over perceptual dHashes (§2c.34i) —
    * the image-side sibling of the simhash text family: DISTINCT
    * 64-bit dHashes (with their corpus mass: count + min-doc
    * representative) are banded into 16×4-bit keys, candidate hash
    * pairs share ≥1 band, and survivors verify by exact hamming
    * distance (xor + popcount on the two 32-bit halves) ≤
    * `maxHamming`. At the default 15 the banding is LOSSLESS by
    * pigeonhole (15 differing bits cannot touch all 16 bands), so the
    * banded route provably equals brute force — spec-asserted — while
    * never forming the all-pairs space.
    *
    * Scale shape: the pair mining runs over the DISTINCT-hash table,
    * which is ≪ corpus for any real image collection (re-encodes and
    * crops collapse to few hashes); corpus size enters only the
    * map-side groupBy that builds it. Each output pair carries both
    * hashes' masses, so "merge these two exact-dup clusters" is the
    * downstream action without another corpus pass.
    */
  def phashNearDups(hashes: DataFrame, maxHamming: Int = 15): DataFrame = {
    val base = hashes.groupBy("phash")
      .agg(count(lit(1)).as("n"), min("doc_id").as("rep"))
      // fixed-width lowercase hex: halves parse as unsigned 32-bit
      // values (each fits a signed long), lexicographic hex order ==
      // numeric order, so `pa < pb` below is a total hash order
      .withColumn("hi", conv(substring(col("phash"), 1, 8), 16, 10)
        .cast("long"))
      .withColumn("lo", conv(substring(col("phash"), 9, 8), 16, 10)
        .cast("long"))
    val nibbles = (0 until 16).map { i =>
      if (i < 8) shiftrightunsigned(col("lo"), 4 * i).bitwiseAND(lit(15L))
      else shiftrightunsigned(col("hi"), 4 * (i - 8)).bitwiseAND(lit(15L))
    }
    val banded = base.select(col("phash"), col("hi"), col("lo"),
      col("n"), col("rep"),
      posexplode(array(nibbles: _*)).as(Seq("band", "key")))
    def side(s: String) = banded.select(col("band"), col("key"),
      col("phash").as(s"p$s"), col("hi").as(s"h$s"), col("lo").as(s"l$s"),
      col("n").as(s"n_$s"), col("rep").as(s"rep_$s"))
    side("a").join(side("b"), Seq("band", "key"))
      .where(col("pa") < col("pb"))
      .dropDuplicates("pa", "pb")
      .withColumn("dist",
        expr("bit_count(ha ^ hb) + bit_count(la ^ lb)").cast("long"))
      .where(col("dist") <= maxHamming)
      .select(col("pa").as("a_hash"), col("pb").as("b_hash"), col("dist"),
        col("n_a"), col("n_b"), col("rep_a"), col("rep_b"))
      .orderBy("a_hash", "b_hash")
  }
}
