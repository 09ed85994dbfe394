package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, processed in partition-local batches.
  *
  * Image (PNG/JPEG/GIF/BMP via javax.imageio), audio (WAV/PCM via
  * javax.sound.sampled) and multi-frame animated GIF (`decodeGifMeta` —
  * the one motion format with an in-JDK codec) decode REAL pixels/frames
  * with the JDK's own codecs. True video containers (mp4 etc.) are
  * STUBBED (no JDK codec exists):
  * `decodeStub` derives deterministic fake metadata/features from the
  * bytes. Everything around the stub — schema, batched mapPartitions
  * execution, partition sizing, feature schema — is the real distributed
  * plumbing a codec would drop into: replace `decodeStub`'s body with a
  * JNI/javacv call and nothing else changes.
  */
object Multimodal {

  case class MediaRecord(
      media_id: Long,
      kind: String,            // image | audio | video
      payload: Array[Byte],
      source: String)

  case class MediaMeta(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      format: String,          // sniffed container/codec name
      width: Int,              // image/video; -1 otherwise
      height: Int,
      duration_ms: Long,       // audio/video; -1 otherwise
      checksum: Long)

  case class MediaFeature(
      media_id: Long,
      kind: String,
      feature: Array[Float])   // fixed-dim embedding

  /** ==== STUB ==== deterministic fake decode: metadata from byte stats.
    * Real implementation: format sniffing + codec decode per record. */
  def decodeStub(r: MediaRecord): MediaMeta = {
    val sum = graft.functions.RollingHash.hash(
      java.util.Base64.getEncoder.encodeToString(r.payload))
    val magic = r.payload.take(4).map("%02x".format(_)).mkString
    val fake = (sum % 1024).toInt
    MediaMeta(r.media_id, r.kind, r.payload.length.toLong,
      format = r.kind match {
        case "image" => if (magic.startsWith("8950")) "png" else "jpeg-stub"
        case "audio" => "pcm-stub"
        case _ => "mp4-stub"
      },
      width = if (r.kind != "audio") 64 + fake % 512 else -1,
      height = if (r.kind != "audio") 64 + (fake / 2) % 512 else -1,
      duration_ms = if (r.kind != "image") 1000L + sum % 60000 else -1L,
      checksum = sum)
  }

  /** ==== STUB ==== deterministic fake feature extraction: a `dim`-dim
    * pseudo-embedding seeded by the payload's md5. md5-derived — not JVM
    * Random gaussians — so the fake features are reproducible in any
    * engine. All components come from a hex pool stretched from ONE
    * payload digest (md5(payload) ‖ md5("1|"‖md5) ‖ md5("2|"‖md5) …),
    * 4 hex chars per component % 1000 on [-1, 1) — ceil(dim/8)+1 digests
    * total instead of dim+1 per record (the round-3 bench regression).
    * DuckDB twin: CAST('0x' || substr(pool, i*4+1, 4) AS BIGINT). Real
    * implementation: model inference over the decoded tensor, batched
    * per partition. */
  def featureStub(r: MediaRecord, dim: Int = 16): MediaFeature = {
    def md5hex(bytes: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(bytes)
        .map("%02x".format(_)).mkString
    val ph = md5hex(r.payload)
    val pool = (ph +: Iterator.from(1).map(j => md5hex(s"$j|$ph".getBytes("UTF-8")))
      .take(((dim * 4 - 32).max(0) + 31) / 32).toSeq).mkString
    val feats = Array.tabulate(dim) { i =>
      val h = java.lang.Long.parseLong(pool.substring(i * 4, i * 4 + 4), 16)
      ((h % 1000) / 500.0 - 1.0).toFloat
    }
    MediaFeature(r.media_id, r.kind, feats)
  }

  /** ==== REAL ==== image decode for the formats the JDK ships codecs
    * for (PNG/JPEG/GIF/BMP via javax.imageio — no external deps): the
    * pixels are actually decoded (`reader.read`, not just a header
    * sniff) and width/height/format come from the real bytes. Returns
    * None for payloads no installed reader claims — the caller degrades
    * to the documented stub, which remains the boundary for audio/video
    * (no JDK codec exists for those). */
  def decodeImage(r: MediaRecord): Option[MediaMeta] = {
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(r.payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext) None
      else {
        val rd = readers.next()
        try {
          rd.setInput(in)
          val img = rd.read(0) // full pixel decode, not just the header
          Some(MediaMeta(r.media_id, r.kind, r.payload.length.toLong,
            format = rd.getFormatName.toLowerCase,
            width = img.getWidth, height = img.getHeight,
            duration_ms = -1L,
            checksum = graft.functions.RollingHash.hash(
              java.util.Base64.getEncoder.encodeToString(r.payload))))
        } catch { case _: Exception => None }
        finally rd.dispose()
      }
    } finally if (in != null) in.close()
  }

  /** ==== REAL ==== audio decode for the one format the JDK ships a
    * codec for (WAV/PCM via javax.sound.sampled — no external deps):
    * every frame is pulled through the decoder (`read` to exhaustion,
    * not a header sniff), so sample rate, channel count, frame count and
    * duration come from the actually-decoded stream. None for payloads
    * the audio system doesn't claim — callers degrade to the documented
    * stub, which after this remains the boundary only for video. */
  def decodeWavMeta(r: MediaRecord): Option[WavMeta] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(r.payload))
      try {
        val fmt = ais.getFormat
        // real decode: stream every frame through the codec and count
        // what actually came out, rather than trusting the header
        val buf = new Array[Byte](8192)
        var decoded = 0L
        var n = ais.read(buf)
        while (n >= 0) { decoded += n; n = ais.read(buf) }
        val frameSize = fmt.getFrameSize
        if (frameSize <= 0 || fmt.getFrameRate <= 0) None
        else {
          val frames = decoded / frameSize
          Some(WavMeta(r.media_id, "wave",
            sample_rate = fmt.getSampleRate.toInt,
            channels = fmt.getChannels,
            n_frames = frames,
            duration_ms = frames * 1000L / fmt.getFrameRate.toLong))
        }
      } finally ais.close()
    } catch { case _: Exception => None }

  case class WavMeta(
      media_id: Long,
      format: String,
      sample_rate: Int,
      channels: Int,
      n_frames: Long,
      duration_ms: Long)

  /** Audio-real decode pass: WAV payloads decode for real; anything the
    * audio system rejects is dropped (callers that need a total function
    * use decodeReal, which falls back to the stub). */
  def decodeWav(ds: Dataset[MediaRecord]): Dataset[WavMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(decodeWavMeta))
  }

  /** Deterministic synthetic 16-bit little-endian PCM WAV (fixture
    * generator for the real-decode oracle): `nFrames` frames of a
    * seed-keyed sawtooth, encoded by the JDK's own WAV writer. Only the
    * DECODED metadata (rate/channels/frames/duration) is oracled —
    * closed-form from the arguments. */
  def syntheticWav(sampleRate: Int, channels: Int, nFrames: Int,
      seed: Long): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, channels, true, false)
    val data = new Array[Byte](nFrames * channels * 2)
    var i = 0
    while (i < nFrames * channels) {
      val s = ((i * 257L + seed * 131L) % 65536L - 32768L).toShort
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** Deterministic synthetic PNG (fixture generator for the real-decode
    * oracle): a width×height RGB gradient keyed by `seed`, encoded by the
    * JDK's own PNG writer. Byte-level output may vary across JDKs — only
    * the DECODED metadata (width/height/format) is oracled. */
  def syntheticPng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y, ((x * 31L + y * 17L + seed) % 0xFFFFFF).toInt)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  case class GifMeta(
      media_id: Long,
      format: String,
      n_frames: Int,
      width: Int,
      height: Int)

  /** ==== REAL ==== multi-frame GIF decode (javax.imageio — the one
    * MOTION format the JDK ships a codec for): every frame's pixels are
    * pulled through `reader.read(i)` (not a header sniff, not
    * getNumImages alone), the frame count comes from an exact
    * `getNumImages(true)` scan, and width/height are the maxima over the
    * actually-decoded frames. None for payloads the GIF reader doesn't
    * claim — true video containers (mp4 etc.) remain the documented stub
    * boundary, this makes the "video" column real for one motion
    * format. */
  def decodeGifMeta(r: MediaRecord): Option[GifMeta] = {
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(r.payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      var found: Option[GifMeta] = None
      while (found.isEmpty && readers.hasNext) {
        val rd = readers.next()
        if (rd.getFormatName.equalsIgnoreCase("gif")) {
          try {
            rd.setInput(in)
            val n = rd.getNumImages(true) // exact: scans the stream
            var w = 0
            var h = 0
            var i = 0
            while (i < n) {
              val img = rd.read(i) // full pixel decode of EVERY frame
              w = w.max(img.getWidth)
              h = h.max(img.getHeight)
              i += 1
            }
            if (n > 0) found = Some(GifMeta(r.media_id, "gif", n, w, h))
          } catch { case _: Exception => }
          finally rd.dispose()
        } else rd.dispose()
      }
      found
    } finally if (in != null) in.close()
  }

  /** Motion-decode pass: GIF payloads decode frame-by-frame for real;
    * anything the GIF reader rejects is dropped (total-function callers
    * use decodeReal, which falls back through image → wav → stub). */
  def decodeGif(ds: Dataset[MediaRecord]): Dataset[GifMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(decodeGifMeta))
  }

  /** Deterministic synthetic animated GIF (fixture generator for the
    * real-decode oracle): `nFrames` frames of width×height seed-keyed
    * gradients, written as one sequence by the JDK's own GIF writer.
    * Byte output may vary across JDKs — only the DECODED metadata
    * (frame count, dimensions) is oracled, closed-form from the
    * arguments. */
  def syntheticGif(width: Int, height: Int, nFrames: Int,
      seed: Long): Array[Byte] = {
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    val baos = new java.io.ByteArrayOutputStream()
    val out = javax.imageio.ImageIO.createImageOutputStream(baos)
    try {
      writer.setOutput(out)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(
          width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            img.setRGB(x, y,
              ((x * 31L + y * 17L + f * 101L + seed) % 0xFFFFFF).toInt)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      out.close()
    }
    baos.toByteArray
  }

  /** Decode pass: partition-local, batch-shaped (the iterator is the
    * batch; a real codec would reuse native buffers across records). */
  def decode(ds: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(decodeStub))
  }

  /** Decode pass with the REAL JDK codecs in front: payloads an
    * installed ImageIO reader or the WAV audio system recognizes decode
    * for real; everything else (video, non-media bytes) degrades to the
    * stub boundary. */
  def decodeReal(ds: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      decodeImage(r)
        .orElse(decodeWavMeta(r).map(w =>
          MediaMeta(w.media_id, r.kind, r.payload.length.toLong,
            format = w.format, width = -1, height = -1,
            duration_ms = w.duration_ms,
            checksum = graft.functions.RollingHash.hash(
              java.util.Base64.getEncoder.encodeToString(r.payload)))))
        .getOrElse(decodeStub(r))
    })
  }

  def features(ds: Dataset[MediaRecord], dim: Int = 16): Dataset[MediaFeature] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(featureStub(_, dim)))
  }

  /** Frame sampling stub for video: every nth kilobyte slice stands in for
    * a decoded frame — the exploded (media_id, frame_no, frame_bytes)
    * shape is what matters downstream. */
  def sampleFrames(ds: Dataset[MediaRecord], everyN: Int = 4): DataFrame = {
    import ds.sparkSession.implicits._
    ds.filter(_.kind == "video")
      .flatMap { r =>
        r.payload.grouped(1024).zipWithIndex
          .filter(_._2 % everyN == 0)
          .map { case (bytes, i) => (r.media_id, i, bytes) }
      }
      .toDF("media_id", "frame_no", "frame_bytes")
  }

  /** Build a deterministic media table from the documents fixture: text
    * bytes stand in for payloads (no codecs in this environment), ids and
    * kinds derived from doc_id. Gives the pipeline real, partitioned
    * binary data of realistic skew. */
  def syntheticMedia(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables(spark, dir, "documents")
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        col("source"))
      .as[MediaRecord]
  }
}
