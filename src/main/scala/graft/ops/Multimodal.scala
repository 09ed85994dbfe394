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

  case class DecimatedWav(
      media_id: Long,
      sample_rate: Int,
      channels: Int,
      n_frames_in: Long,
      n_frames_kept: Long,
      pcm_checksum: Long)      // Σ (k·ch + c + 1) · sample(k·everyN, c)

  /** ==== REAL ==== audio decimation (the audio frame-sample): decode the
    * full PCM stream through the JDK codec, keep every `everyN`-th frame
    * — pure integer frame indexing, no resampling filter whose
    * coefficients would be implementation-defined — and return a
    * position-weighted checksum over the kept 16-bit samples, so an
    * oracle that re-derives it closed-form from planted sample
    * arithmetic proves the decode ran AND exactly the right frames were
    * kept (an off-by-one stride or channel swap cannot match). Only
    * 16-bit little-endian signed PCM is checksummed (the syntheticWav
    * contract); other formats drop. */
  def decimateWavMeta(r: MediaRecord, everyN: Int): Option[DecimatedWav] = {
    // everyN <= 0 would spin the frame loop forever (f += everyN) —
    // and an infinite loop is not catchable by the payload-error guard
    require(everyN >= 1, s"decimateWav stride must be >= 1, got $everyN")
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(r.payload))
      try {
        val fmt = ais.getFormat
        val ok = fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian &&
          fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getFrameSize == 2 * fmt.getChannels
        if (!ok) None
        else {
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var n = ais.read(buf)
          while (n >= 0) { out.write(buf, 0, n); n = ais.read(buf) }
          val pcm = out.toByteArray
          val ch = fmt.getChannels
          val frameSize = 2 * ch
          val framesIn = pcm.length / frameSize
          var sum = 0L
          var kept = 0L
          var f = 0
          while (f < framesIn) {
            var c = 0
            while (c < ch) {
              val o = f * frameSize + 2 * c
              val s = ((pcm(o) & 0xff) | (pcm(o + 1) << 8)).toShort
              sum += (kept * ch + c + 1) * s.toLong
              c += 1
            }
            kept += 1
            f += everyN
          }
          Some(DecimatedWav(r.media_id, fmt.getSampleRate.toInt, ch,
            framesIn, kept, sum))
        }
      } finally ais.close()
    } catch { case _: Exception => None }
  }

  /** Decimation pass over a media column (partition-local decode; see
    * [[decimateWavMeta]]); non-PCM payloads drop. */
  def decimateWav(ds: Dataset[MediaRecord], everyN: Int): Dataset[DecimatedWav] = {
    require(everyN >= 1, s"decimateWav stride must be >= 1, got $everyN")
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(decimateWavMeta(_, everyN)))
  }

  case class WavFrameFeatures(
      media_id: Long,
      frame_idx: Long,      // analysis-window index (windowLen PCM frames)
      n_samples: Long,      // samples in this window across channels
      energy_sq: Long,      // Σ s² — exact integer energy
      zero_crossings: Long, // strict sign flips per channel inside the window
      peak_abs: Long)       // max |s|

  /** ==== REAL ==== per-window audio features over the decoded PCM — the
    * feature-extraction step an audio training pipeline runs before
    * quality gating (silence/clipping detection via energy + peak,
    * noisiness via zero-crossing rate). The stream decodes through the
    * JDK codec and every statistic is an exact integer (Σ s², sign-flip
    * counts, max |s|), so an oracle can re-derive all of them closed-form
    * from planted sample arithmetic — a hash match proves the real decode
    * ran AND the window/channel indexing is exactly right.
    *
    * Windows are non-overlapping runs of `windowLen` PCM frames (the last
    * may be short — n_samples says so); a zero crossing is a strict sign
    * change between a frame and its predecessor IN THE SAME WINDOW and
    * channel (window-local, so windows are independently computable under
    * any partitioning — and independently replayable in SQL). Only 16-bit
    * little-endian signed PCM qualifies (the syntheticWav contract). */
  def wavFrameFeaturesMeta(r: MediaRecord,
      windowLen: Int): Seq[WavFrameFeatures] = {
    require(windowLen >= 1, s"window length must be >= 1, got $windowLen")
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(r.payload))
      try {
        val fmt = ais.getFormat
        val ok = fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian &&
          fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getFrameSize == 2 * fmt.getChannels
        if (!ok) Seq.empty
        else {
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var n = ais.read(buf)
          while (n >= 0) { out.write(buf, 0, n); n = ais.read(buf) }
          val pcm = out.toByteArray
          val ch = fmt.getChannels
          val frameSize = 2 * ch
          val framesIn = pcm.length / frameSize
          def sample(f: Int, c: Int): Long = {
            val o = f * frameSize + 2 * c
            ((pcm(o) & 0xff) | (pcm(o + 1) << 8)).toShort.toLong
          }
          val nWin = (framesIn + windowLen - 1) / windowLen
          (0 until nWin).map { w =>
            val f0 = w * windowLen
            val f1 = math.min(framesIn, f0 + windowLen)
            var energy = 0L; var zc = 0L; var peak = 0L; var cnt = 0L
            var f = f0
            while (f < f1) {
              var c = 0
              while (c < ch) {
                val s = sample(f, c)
                energy += s * s
                if (math.abs(s) > peak) peak = math.abs(s)
                if (f > f0 && sample(f - 1, c) * s < 0L) zc += 1L
                cnt += 1L
                c += 1
              }
              f += 1
            }
            WavFrameFeatures(r.media_id, w.toLong, cnt, energy, zc, peak)
          }
        }
      } finally ais.close()
    } catch { case _: Exception => Seq.empty }
  }

  /** Feature-extraction pass over a media column (partition-local decode;
    * see [[wavFrameFeaturesMeta]]); non-PCM payloads drop. */
  def wavFrameFeatures(ds: Dataset[MediaRecord],
      windowLen: Int): Dataset[WavFrameFeatures] = {
    require(windowLen >= 1, s"window length must be >= 1, got $windowLen")
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(wavFrameFeaturesMeta(_, windowLen)))
  }

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

  case class ResizedImage(
      media_id: Long,
      format: String,
      src_width: Int,
      src_height: Int,
      out_width: Int,
      out_height: Int,
      pix_checksum: Long)      // Σ (y·outW+x+1) · rgb(srcX, srcY)

  /** ==== REAL ==== deterministic image resize (nearest-neighbor): the
    * pixels are decoded by the JDK codec, then resampled with PURE
    * INTEGER index math — srcX = x·srcW div outW, srcY = y·srcH div
    * outH — never Graphics2D interpolation, whose rounding is
    * implementation-defined and would break cross-engine replay. The
    * returned checksum is position-weighted (Σ (pos+1)·rgb), so a
    * transposed, flipped or wrongly-strided resample cannot hash-match:
    * an oracle that re-derives the checksum closed-form from planted
    * pixel arithmetic proves the decode AND the exact source-pixel
    * selection. None for payloads no image reader claims. */
  def resizeImageMeta(r: MediaRecord, outW: Int, outH: Int): Option[ResizedImage] = {
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(r.payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext) None
      else {
        val rd = readers.next()
        try {
          rd.setInput(in)
          val img = rd.read(0)
          val (w, h) = (img.getWidth, img.getHeight)
          var sum = 0L
          var y = 0
          while (y < outH) {
            val sy = y * h / outH
            var x = 0
            while (x < outW) {
              val sx = x * w / outW
              sum += (y.toLong * outW + x + 1) *
                (img.getRGB(sx, sy) & 0xFFFFFF)
              x += 1
            }
            y += 1
          }
          Some(ResizedImage(r.media_id, rd.getFormatName.toLowerCase,
            w, h, outW, outH, sum))
        } catch { case _: Exception => None }
        finally rd.dispose()
      }
    } finally if (in != null) in.close()
  }

  /** Resize pass over a media column: partition-local decode + integer
    * nearest-neighbor resample (see [[resizeImageMeta]]); non-images
    * drop. The thumbnail shape every multimodal training pipeline
    * needs — normalize wildly-varying source dimensions to one grid. */
  def resizeImages(ds: Dataset[MediaRecord], outW: Int, outH: Int): Dataset[ResizedImage] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(resizeImageMeta(_, outW, outH)))
  }

  case class ImageAHash(
      media_id: Long,
      width: Int,
      height: Int,
      ahash: Long,     // grid² bits, bit (y·grid+x) = gray(x,y) > mean
      bits_set: Int)

  /** ==== REAL ==== perceptual average-hash over the decoded pixels —
    * the image near-dup fingerprint (a re-encoded / slightly-cropped
    * copy keeps most bits, so Hamming distance on `ahash` buckets
    * duplicates the way SimHash buckets text). ALL-INTEGER recipe so any
    * engine replays it bit-for-bit: nearest-neighbor sample to a
    * grid×grid raster (the [[resizeImageMeta]] index math — srcX = x·w
    * div grid), gray = (r + g + b) div 3, mean = Σ gray div grid²
    * (integer floor), bit set iff gray > mean. No float, no DCT, no
    * implementation-defined resampler anywhere. None for payloads no
    * image reader claims. */
  def imageAHashMeta(r: MediaRecord, grid: Int = 8): Option[ImageAHash] = {
    require(grid >= 1 && grid * grid <= 64,
      s"grid² must fit the 64-bit hash, got $grid")
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(r.payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext) None
      else {
        val rd = readers.next()
        try {
          rd.setInput(in)
          val img = rd.read(0)
          val (w, h) = (img.getWidth, img.getHeight)
          val gray = new Array[Long](grid * grid)
          var sum = 0L
          var y = 0
          while (y < grid) {
            val sy = y * h / grid
            var x = 0
            while (x < grid) {
              val sx = x * w / grid
              val v = img.getRGB(sx, sy) & 0xFFFFFF
              val g = (((v >> 16) & 0xFF) + ((v >> 8) & 0xFF) + (v & 0xFF)) / 3
              gray(y * grid + x) = g.toLong
              sum += g
              x += 1
            }
            y += 1
          }
          val mean = sum / (grid * grid)
          var hash = 0L
          var bits = 0
          var i = 0
          while (i < grid * grid) {
            if (gray(i) > mean) { hash |= (1L << i); bits += 1 }
            i += 1
          }
          Some(ImageAHash(r.media_id, w, h, hash, bits))
        } catch { case _: Exception => None }
        finally rd.dispose()
      }
    } finally if (in != null) in.close()
  }

  /** Fingerprint pass over a media column (partition-local decode; see
    * [[imageAHashMeta]]); non-images drop. */
  def imageAHash(ds: Dataset[MediaRecord], grid: Int = 8): Dataset[ImageAHash] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(imageAHashMeta(_, grid)))
  }

  /** Image near-duplicate PAIRS over [[imageAHash]] fingerprints — the
    * multimodal analogue of MinHash-LSH banding: the 64-bit hash splits
    * into `bands` equal slices; candidate pairs share ≥1 identical band
    * (one EQUI-JOIN on (band, key) — work is Σ per-bucket pairs, never
    * corpus²), then verified by an exact popcount of the XOR.
    *
    * With `maxDist < bands` the output is EXACTLY all pairs at Hamming
    * distance ≤ maxDist — not an approximation: a pair differing in ≤
    * maxDist bits cannot differ in every one of `bands` > maxDist bands
    * (pigeonhole), so some band matches and the candidate join has
    * recall 1.0; the popcount filter then gives precision 1.0. The
    * default (4 × 16-bit bands, maxDist 3) is the re-encoded/
    * slightly-cropped duplicate regime aHash exists for.
    *
    * Input: a frame carrying (idCol, hashCol) — typically
    * `imageAHash(...).toDF()`. Returns (media_a, media_b, hamming),
    * media_a < media_b. */
  def imageNearDupPairs(hashes: DataFrame, idCol: String = "media_id",
      hashCol: String = "ahash", maxDist: Int = 3,
      bands: Int = 4): DataFrame = {
    require(maxDist >= 0 && maxDist < bands,
      s"exact recall needs maxDist < bands (pigeonhole), got $maxDist/$bands")
    val banded = bandedHashes(hashes, idCol, hashCol, bands)
    val a = banded.select(col(idCol).as("media_a"), col(hashCol).as("__ha"),
      col("band"), col("key"))
    val b = banded.select(col(idCol).as("media_b"), col(hashCol).as("__hb"),
      col("band"), col("key"))
    a.join(b, Seq("band", "key"))
      .filter(col("media_a") < col("media_b"))
      .select("media_a", "media_b", "__ha", "__hb").distinct()
      .withColumn("hamming",
        bit_count(col("__ha").bitwiseXOR(col("__hb"))))
      .filter(col("hamming") <= maxDist)
      .select(col("media_a"), col("media_b"),
        col("hamming").cast("int").as("hamming"))
  }

  /** (idCol, hashCol, band, key): the 64-bit hash split into `bands`
    * equal slices — the banding shared by [[imageNearDupPairs]] and the
    * streaming alert's static corpus index
    * ([[graft.streaming.StreamingOps.imageNearDupAlerts]]). */
  def bandedHashes(hashes: DataFrame, idCol: String = "media_id",
      hashCol: String = "ahash", bands: Int = 4): DataFrame = {
    require(bands >= 1 && 64 % bands == 0,
      s"bands must divide 64, got $bands")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1L
    hashes
      .select(col(idCol), col(hashCol),
        explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"),
            shiftrightunsigned(col(hashCol), b * width)
              .bitwiseAND(lit(mask)).as("key"))): _*)).as("bk"))
      .select(col(idCol), col(hashCol),
        col("bk.band").as("band"), col("bk.key").as("key"))
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

  case class MjpegFrame(
      media_id: Long,
      frame_idx: Int,
      width: Int,
      height: Int,
      checksum: Long)          // Σ (rowMajorPos+1) · band-0 sample

  /** ==== REAL ==== MJPEG frame decode — the first true VIDEO-FRAME
    * path with no native codec: an MJPEG stream is back-to-back baseline
    * JPEGs (the form webcams/AVIs carry), and the JDK ships a JPEG
    * codec. Frames are split by a segment-aware walker (NOT a naive
    * FFD9 scan: APPn/COM payloads may legally contain marker-shaped
    * bytes, so lengths are honored and entropy-coded data is skipped
    * per the FF-stuffing rules), then EVERY frame's pixels are pulled
    * through `ImageIO.read` and checksummed position-weighted over the
    * raster's band 0 — the decode has to run and run correctly for the
    * checksum to come out. A frame the codec rejects drops (None row);
    * a payload with no SOI yields no frames. mp4/h264-style
    * inter-coded video remains the documented native-codec boundary. */
  def decodeMjpegFrames(r: MediaRecord): Seq[MjpegFrame] = {
    val b = r.payload
    def u8(i: Int): Int = b(i) & 0xFF
    val out = scala.collection.mutable.ArrayBuffer.empty[MjpegFrame]
    var p = 0
    var idx = 0
    try {
      while (p + 1 < b.length) {
        // seek SOI
        while (p + 1 < b.length && !(u8(p) == 0xFF && u8(p + 1) == 0xD8)) p += 1
        if (p + 1 < b.length) {
          val start = p
          p += 2
          var end = -1
          var bad = false
          // marker-segment walk to this frame's EOI
          while (end < 0 && !bad && p + 1 < b.length) {
            if (u8(p) != 0xFF) { bad = true }
            else {
              var m = u8(p + 1)
              // fill bytes: FF may pad before a marker
              while (m == 0xFF && p + 2 < b.length) { p += 1; m = u8(p + 1) }
              if (m == 0xD9) end = p + 2
              else if (m == 0xD8) bad = true // nested SOI: malformed
              else if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) p += 2
              else if (p + 3 < b.length) {
                val len = (u8(p + 2) << 8) | u8(p + 3)
                val isSos = m == 0xDA
                p += 2 + len
                if (isSos) {
                  // entropy-coded data: FF is either stuffed (FF00),
                  // a restart (FFD0-D7), or the next true marker
                  var done = false
                  while (!done && p + 1 < b.length) {
                    if (u8(p) == 0xFF && u8(p + 1) != 0x00 &&
                        !(u8(p + 1) >= 0xD0 && u8(p + 1) <= 0xD7)) done = true
                    else p += 1
                  }
                }
              } else bad = true
            }
          }
          if (end > 0) {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(
                java.util.Arrays.copyOfRange(b, start, end)))
            if (img != null) {
              val (w, h) = (img.getWidth, img.getHeight)
              val raster = img.getRaster
              var sum = 0L
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  sum += (y.toLong * w + x + 1) * raster.getSample(x, y, 0)
                  x += 1
                }
                y += 1
              }
              out += MjpegFrame(r.media_id, idx, w, h, sum)
              idx += 1
            }
            p = end
          } else if (bad) p = start + 2 // malformed: seek the next SOI
          else p = b.length            // ran off the end: stop
        }
      }
      out.toSeq
    } catch { case _: Exception => out.toSeq }
  }

  /** MJPEG decode pass over a media column (partition-local, one output
    * row per decoded frame; non-MJPEG payloads yield no rows). */
  def decodeMjpeg(ds: Dataset[MediaRecord]): Dataset[MjpegFrame] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(decodeMjpegFrames))
  }

  /** Deterministic synthetic MJPEG (fixture generator for the
    * real-decode oracle): `nFrames` back-to-back grayscale JPEGs,
    * frame f a SOLID gray ((29 + seed·7 + f·13) % 256) encoded at
    * compression quality 1.0 — all-ones quantization tables, so a
    * uniform block's lone DC coefficient survives quantization exactly
    * and the decoded raster equals the input bit-for-bit (verified in
    * spec). That exact round trip is what lets the per-frame
    * position-weighted checksum be CLOSED-FORM from the arguments:
    * g · n(n+1)/2 with n = width·height. */
  def syntheticMjpeg(width: Int, height: Int, nFrames: Int,
      seed: Long): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    var f = 0
    while (f < nFrames) {
      baos.write(encodeSolidJpeg(width, height,
        ((29L + seed * 7L + f * 13L) % 256L).toInt))
      f += 1
    }
    baos.toByteArray
  }

  /** One solid-gray baseline JPEG at compression quality 1.0 (all-ones
    * quantization tables — the uniform block's DC coefficient survives
    * exactly, so the decoded raster equals the input bit-for-bit).
    * Shared by the MJPEG and AVI fixture generators. */
  private def encodeSolidJpeg(width: Int, height: Int,
      gray: Int): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.getRaster().setSample(x, y, 0, gray); x += 1 }
      y += 1
    }
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpeg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(1.0f)
    val out = javax.imageio.ImageIO.createImageOutputStream(baos)
    try {
      writer.setOutput(out)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    } finally { writer.dispose(); out.close() }
    baos.toByteArray
  }

  /** ==== REAL ==== AVI (RIFF) MJPEG frame decode — how MJPEG actually
    * ARRIVES: not raw concatenated JPEGs but RIFF chunks
    * (Microsoft AVI, the mp4 box-walker pattern with little-endian
    * sizes). Walks the chunk sequence — fourcc + u32le size + payload,
    * odd sizes padded to even — recursing into `LIST` chunks; inside a
    * `LIST movi` (or its `rec ` groupings) every `##dc`/`##db` stream
    * chunk (two ASCII stream digits + compressed/uncompressed-DIB tag)
    * is one video frame, whose payload feeds the same JDK JPEG decode +
    * position-weighted band-0 raster checksum as [[decodeMjpegFrames]].
    * Non-RIFF payloads, header/index chunks (`hdrl`/`JUNK`/`idx1`) and
    * frames the codec rejects yield no rows. Frame order is chunk order
    * in `movi` — the container's presentation order. */
  def decodeAviFrames(r: MediaRecord): Seq[MjpegFrame] = {
    val b = r.payload
    def u32le(o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    def fourcc(o: Int): String = new String(b, o, 4, "US-ASCII")
    if (b.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ")
      return Nil
    def isFrameChunk(id: String): Boolean =
      id.length == 4 && id(0).isDigit && id(1).isDigit &&
        id(2) == 'd' && (id(3) == 'c' || id(3) == 'b')
    val out = scala.collection.mutable.ArrayBuffer.empty[MjpegFrame]
    var idx = 0
    def walk(from: Int, until: Int, inMovi: Boolean): Unit = {
      var o = from
      while (o + 8 <= until) {
        val id = fourcc(o)
        val size = u32le(o + 4).min(Int.MaxValue.toLong).toInt
        val start = o + 8
        val end = math.min(start.toLong + size, until.toLong).toInt
        if (id == "LIST" && end >= start + 4)
          walk(start + 4, end, inMovi || fourcc(start) == "movi")
        else if (inMovi && isFrameChunk(id) && end > start) {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(
              java.util.Arrays.copyOfRange(b, start, end)))
          if (img != null) {
            val (w, h) = (img.getWidth, img.getHeight)
            val raster = img.getRaster
            var sum = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                sum += (y.toLong * w + x + 1) * raster.getSample(x, y, 0)
                x += 1
              }
              y += 1
            }
            out += MjpegFrame(r.media_id, idx, w, h, sum)
            idx += 1
          }
        }
        // chunk data pads to an even boundary (RIFF rule)
        o = start + size + (size & 1)
      }
    }
    try {
      walk(12, b.length, inMovi = false)
      out.toSeq
    } catch { case _: Exception => out.toSeq }
  }

  /** AVI frame-decode pass over a media column (partition-local, one
    * output row per decoded frame; non-AVI payloads yield no rows). */
  def decodeAvi(ds: Dataset[MediaRecord]): Dataset[MjpegFrame] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(decodeAviFrames))
  }

  /** Deterministic synthetic AVI (fixture generator for the RIFF-walker
    * oracle): a spec-shaped RIFF/AVI — `LIST hdrl` with a real `avih`
    * main header, an ODD-sized `JUNK` chunk (exercises the even-boundary
    * pad rule), then `LIST movi` holding one `00dc` chunk per frame,
    * each a solid-gray quality-1.0 JPEG with the SAME gray arithmetic as
    * [[syntheticMjpeg]] — so the per-frame checksum stays closed-form:
    * g · n(n+1)/2, n = width·height, g = (29 + seed·7 + f·13) % 256. */
  def syntheticAvi(width: Int, height: Int, nFrames: Int,
      seed: Long): Array[Byte] = {
    def le32(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val pad = if ((payload.length & 1) == 1) Array(0.toByte)
        else Array.empty[Byte]
      id.getBytes("US-ASCII") ++ le32(payload.length.toLong) ++
        payload ++ pad
    }
    def list(listType: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", listType.getBytes("US-ASCII") ++ body)
    // avih: dwMicroSecPerFrame, dwMaxBytesPerSec, dwPaddingGranularity,
    // dwFlags, dwTotalFrames, dwInitialFrames, dwStreams,
    // dwSuggestedBufferSize, dwWidth, dwHeight, dwReserved[4]
    val avih = chunk("avih",
      Array(40000L, 0L, 0L, 0L, nFrames.toLong, 0L, 1L, 0L,
        width.toLong, height.toLong, 0L, 0L, 0L, 0L).flatMap(le32))
    val hdrl = list("hdrl", avih)
    val junk = chunk("JUNK",
      Array.tabulate(13)(i => ((i * 17L + seed) % 251).toByte))
    val frames = (0 until nFrames).flatMap { f =>
      chunk("00dc", encodeSolidJpeg(width, height,
        ((29L + seed * 7L + f * 13L) % 256L).toInt))
    }.toArray
    val movi = list("movi", frames)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ junk ++ movi
    "RIFF".getBytes("US-ASCII") ++ le32(body.length.toLong) ++ body
  }

  case class Mp4Meta(
      media_id: Long,
      format: String,          // "mp4"
      duration_ms: Long,       // mvhd duration * 1000 / timescale (floor)
      width: Int,              // max video-track tkhd width (16.16 → int)
      height: Int,
      codec: String)           // first stsd sample-entry fourcc

  /** ==== REAL ==== mp4/ISO-BMFF METADATA parse — a pure-JVM box walker
    * (ISO/IEC 14496-12): no JDK codec exists for mp4 SAMPLE DATA, but
    * the container's structural metadata needs none. Walks the top-level
    * box sequence (32-bit sizes, 64-bit `largesize`, size-0 =
    * to-end-of-file), requires an `ftyp` brand box, then descends
    * moov → mvhd (timescale + duration, version 0 and 1 layouts) and
    * moov → trak → tkhd (16.16 fixed-point presentation size, both
    * versions) / mdia → minf → stbl → stsd (first sample-entry fourcc).
    * Unknown and `free`/`skip` boxes are skipped by size, the way any
    * conformant reader must. Returns None for payloads that are not an
    * ISO-BMFF container — callers degrade to the stub, which after this
    * covers only codec FRAME decode (the one thing that truly needs a
    * native codec). */
  def decodeMp4Meta(r: MediaRecord): Option[Mp4Meta] = {
    val b = r.payload
    def u16(o: Int): Int =
      ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    def u32(o: Int): Long = {
      var v = 0L
      var i = 0
      while (i < 4) { v = (v << 8) | (b(o + i) & 0xffL); i += 1 }
      v
    }
    def u64(o: Int): Long = {
      var v = 0L
      var i = 0
      while (i < 8) { v = (v << 8) | (b(o + i) & 0xffL); i += 1 }
      v
    }
    def fourcc(o: Int): String =
      new String(b, o, 4, "US-ASCII")
    /** Iterate the box sequence in [from, until): (type, payloadStart,
      * payloadEnd). */
    def boxes(from: Int, until: Int): Iterator[(String, Int, Int)] =
      new Iterator[(String, Int, Int)] {
        private var o = from
        def hasNext: Boolean = o + 8 <= until
        def next(): (String, Int, Int) = {
          val size32 = u32(o)
          val t = fourcc(o + 4)
          val (start, end) =
            if (size32 == 1L && o + 16 <= until)
              (o + 16, o + u64(o + 8).min(Int.MaxValue).toInt.max(16))
            else if (size32 == 0L) (o + 8, until)
            else (o + 8, o + size32.toInt.max(8))
          val clampedEnd = end.min(until)
          o = clampedEnd
          (t, start, clampedEnd)
        }
      }
    def find(from: Int, until: Int, t: String): Option[(Int, Int)] =
      boxes(from, until).collectFirst { case (`t`, s, e) => (s, e) }
    if (b.length < 16) return None
    try {
      val tops = boxes(0, b.length).toSeq
      if (!tops.exists(_._1 == "ftyp")) return None
      val (moovS, moovE) = tops.collectFirst {
        case ("moov", s, e) => (s, e)
      }.getOrElse(return None)
      val (mvhdS, _) = find(moovS, moovE, "mvhd").getOrElse(return None)
      val mvhdVer = b(mvhdS) & 0xff
      val (timescale, duration) =
        if (mvhdVer == 1) (u32(mvhdS + 20), u64(mvhdS + 24))
        else (u32(mvhdS + 12), u32(mvhdS + 16))
      if (timescale == 0) return None
      var w = 0
      var h = 0
      var codec = ""
      boxes(moovS, moovE).foreach {
        case ("trak", ts, te) =>
          find(ts, te, "tkhd").foreach { case (ks, _) =>
            val ver = b(ks) & 0xff
            // ...(matrix etc.) then width/height as 16.16 fixed point at
            // the box tail: v0 offset 76, v1 offset 88
            val wOff = ks + (if (ver == 1) 88 else 76)
            val tw = (u32(wOff) >> 16).toInt
            val th = (u32(wOff + 4) >> 16).toInt
            if (tw > 0) { w = w.max(tw); h = h.max(th) }
          }
          for {
            (ms, me) <- find(ts, te, "mdia")
            (ns, ne) <- find(ms, me, "minf")
            (ss, se) <- find(ns, ne, "stbl")
            (ds, de) <- find(ss, se, "stsd")
          } {
            val entryCount = u32(ds + 4)
            if (entryCount > 0 && ds + 16 <= de && codec.isEmpty)
              codec = fourcc(ds + 12)
          }
        case _ =>
      }
      Some(Mp4Meta(r.media_id, "mp4",
        duration * 1000L / timescale, w, h, codec))
    } catch { case _: IndexOutOfBoundsException => None }
  }

  def decodeMp4(ds: Dataset[MediaRecord]): Dataset[Mp4Meta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(decodeMp4Meta))
  }

  /** Deterministic synthetic mp4 container (fixture generator for the
    * box-parser oracle): spec-shaped ftyp/free/moov/mdat with a video
    * trak — mvhd and tkhd alternate version 0/1 layouts so both parse
    * paths are exercised, a `free` box sits inside moov to exercise
    * unknown-box skipping, and the stsd carries the given codec fourcc.
    * Only the PARSED metadata is oracled, closed-form from the
    * arguments (mirroring syntheticGif). */
  def syntheticMp4(width: Int, height: Int, durationMs: Long,
      timescale: Long, codec: String, version: Int,
      seed: Long): Array[Byte] = {
    require(codec.length == 4, "codec must be a 4cc")
    val out = new java.io.ByteArrayOutputStream()
    def box(t: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length)
      bb.put(t.getBytes("US-ASCII"))
      bb.put(payload)
      bb.array()
    }
    def bytes(f: java.nio.ByteBuffer => Unit, n: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(n); f(bb); bb.array()
    }
    val duration = durationMs * timescale / 1000L
    val mvhd =
      if (version == 1) bytes({ bb =>
        bb.putInt(0x01000000)          // version 1, flags 0
        bb.putLong(0L); bb.putLong(0L) // ctime, mtime (64-bit)
        bb.putInt(timescale.toInt)
        bb.putLong(duration)
        bb.putInt(0x00010000); bb.putShort(0x0100.toShort); bb.putShort(0)
        bb.putLong(0L)                 // reserved
        Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
          .foreach(bb.putInt)          // unity matrix
        (0 until 6).foreach(_ => bb.putInt(0)) // pre_defined
        bb.putInt(2)                   // next_track_ID
      }, 4 + 16 + 4 + 8 + 4 + 2 + 2 + 8 + 36 + 24 + 4)
      else bytes({ bb =>
        bb.putInt(0)                   // version 0, flags 0
        bb.putInt(0); bb.putInt(0)     // ctime, mtime
        bb.putInt(timescale.toInt)
        bb.putInt(duration.toInt)
        bb.putInt(0x00010000); bb.putShort(0x0100.toShort); bb.putShort(0)
        bb.putLong(0L)
        Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
          .foreach(bb.putInt)
        (0 until 6).foreach(_ => bb.putInt(0))
        bb.putInt(2)
      }, 4 + 8 + 4 + 4 + 4 + 2 + 2 + 8 + 36 + 24 + 4)
    val tkhd =
      if (version == 1) bytes({ bb =>
        bb.putInt(0x01000007)          // version 1, flags: enabled+in-movie
        bb.putLong(0L); bb.putLong(0L) // ctime, mtime
        bb.putInt(1); bb.putInt(0)     // track_ID, reserved
        bb.putLong(duration)
        bb.putLong(0L)                 // reserved
        bb.putShort(0); bb.putShort(0); bb.putShort(0); bb.putShort(0)
        Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
          .foreach(bb.putInt)
        bb.putInt(width << 16)         // 16.16 fixed point
        bb.putInt(height << 16)
      }, 4 + 16 + 8 + 8 + 8 + 8 + 36 + 8)
      else bytes({ bb =>
        bb.putInt(0x00000007)
        bb.putInt(0); bb.putInt(0)
        bb.putInt(1); bb.putInt(0)
        bb.putInt(duration.toInt)
        bb.putLong(0L)
        bb.putShort(0); bb.putShort(0); bb.putShort(0); bb.putShort(0)
        Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
          .foreach(bb.putInt)
        bb.putInt(width << 16)
        bb.putInt(height << 16)
      }, 4 + 8 + 8 + 4 + 8 + 8 + 36 + 8)
    val sampleEntry = bytes({ bb =>
      bb.putInt(16)                    // entry size (header-only stub)
      bb.put(codec.getBytes("US-ASCII"))
      bb.putLong(0L)                   // reserved + data_reference_index
    }, 16)
    val stsd = box("stsd", bytes({ bb =>
      bb.putInt(0)                     // version + flags
      bb.putInt(1)                     // entry_count
      bb.put(sampleEntry)
    }, 8 + sampleEntry.length))
    val stbl = box("stbl", stsd)
    val minf = box("minf", stbl)
    val mdia = box("mdia", minf)
    val trak = box("trak", box("tkhd", tkhd) ++ mdia)
    val freePad = box("free", Array.fill(16)(0.toByte))
    val moov = box("moov", box("mvhd", mvhd) ++ freePad ++ trak)
    val mdat = box("mdat",
      Array.tabulate(64)(i => ((i * 31L + seed) % 251).toByte))
    out.write(box("ftyp",
      "isom".getBytes("US-ASCII") ++ bytes(_.putInt(512), 4) ++
        "isomiso2".getBytes("US-ASCII")))
    out.write(freePad)
    out.write(moov)
    out.write(mdat)
    out.toByteArray
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
        .orElse(decodeMp4Meta(r).map(m =>
          MediaMeta(m.media_id, r.kind, r.payload.length.toLong,
            format = m.format, width = m.width, height = m.height,
            duration_ms = m.duration_ms,
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
