package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with a typed metadata struct next to them;
  * decode / feature-extraction runs batched per partition so a real
  * decoder (libjpeg, ffmpeg, ...) amortizes init cost per-partition,
  * not per-row.
  *
  * The decode step is pluggable ([[MediaDecoder]]): the default is
  * the deterministic byte-fold STUB (oracle-checkable, depends only
  * on the blob bytes); [[ImageIoDecoder]] swaps in a real image
  * decode on the JDK's own `javax.imageio` for m01/m03/m05-shaped
  * work on actual PNG/JPEG/BMP payloads. The Spark-side contract —
  * schema, partition-batched execution, feature shape — is identical
  * either way and tested on both paths.
  */
object Multimodal {

  /** The decode swap point, made explicit: every media operator takes
    * a `MediaDecoder` and defaults to the deterministic byte-fold
    * stub (the oracle-checkable test path). [[ImageIoDecoder]] is the
    * real-image implementation on `javax.imageio` — zero new
    * dependencies, ships with the JDK. A `None` from any primitive
    * means "not decodable as media": the operator drops the row (the
    * repo-wide no-evidence rule), it never silently falls back to
    * byte stats that would look like a valid fingerprint.
    *
    * Decoders are singleton objects, so the closure serializes a
    * module reference and each executor constructs any heavy decoder
    * state once per JVM — the same per-partition amortization the
    * mapPartitions loops document.
    */
  trait MediaDecoder extends Serializable {
    /** `n` grayscale cells for perceptual hashing (spatial pooling
      * for real images; positional byte fold for the stub). */
    def cells(bytes: Array[Byte], n: Int): Option[Array[Long]]
    /** Resized payload at w x h. */
    def resize(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]]
    /** Feature fold: (n_bytes, head_byte, byte_mean, feature[dim]). */
    def features(bytes: Array[Byte], dim: Int): Option[(Long, Int, Double, Array[Double])]
  }

  /** Deterministic byte-fold stub — the default and the oracle path.
    * Operates on the RAW bytes, so results depend only on the blob. */
  object ByteFoldDecoder extends MediaDecoder {
    def cells(bytes: Array[Byte], n: Int): Option[Array[Long]] = {
      if (bytes == null) return None
      val cs = new Array[Long](n)
      var i = 0
      while (i < bytes.length) { cs(i % n) += (bytes(i) & 0xff); i += 1 }
      Some(cs)
    }
    def resize(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
      if (bytes == null) None
      else Some(java.util.Arrays.copyOf(bytes, math.min(bytes.length, w * h)))
    def features(bytes: Array[Byte], dim: Int): Option[(Long, Int, Double, Array[Double])] =
      if (bytes == null) None else Some(fakeDecode(bytes, dim))
  }

  /** Real image decode on `javax.imageio` (PNG/JPEG/BMP/GIF — the JDK
    * service registry decides). Primitives operate on decoded PIXELS:
    * two encodings of the same image (a PNG and a BMP of identical
    * pixels) produce the SAME cells/features, which is the property
    * that makes the perceptual hash perceptual. Undecodable bytes ->
    * None -> the operator drops the row.
    */
  object ImageIoDecoder extends MediaDecoder {
    /** Decoded luminance plane (ITU-R 601 weights), row-major. */
    private def gray(bytes: Array[Byte]): Option[(Array[Int], Int, Int)] = {
      if (bytes == null || bytes.isEmpty) return None
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) None
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          val lum = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
              lum(y * w + x) = (299 * r + 587 * g + 114 * b) / 1000
              x += 1
            }
            y += 1
          }
          Some((lum, w, h))
        }
      // malformed/crafted payloads can throw far more than IOException
      // (IllegalArgumentException, CMMException, NegativeArraySizeException
      // from bad headers) — all of them mean "undecodable bytes -> None ->
      // drop the row", never a failed Spark task
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    /** Average-pool the luminance plane into a sqrt(n) x sqrt(n) grid
      * — the real dHash reduction (spatial, not positional). */
    def cells(bytes: Array[Byte], n: Int): Option[Array[Long]] = gray(bytes).map {
      case (lum, w, h) =>
        val side = math.max(1, math.sqrt(n.toDouble).toInt)
        val sums = new Array[Long](n)
        val counts = new Array[Long](n)
        var y = 0
        while (y < h) {
          val gy = math.min(side - 1, y * side / h)
          var x = 0
          while (x < w) {
            val gx = math.min(side - 1, x * side / w)
            val c = gy * side + gx
            sums(c) += lum(y * w + x); counts(c) += 1
            x += 1
          }
          y += 1
        }
        var c = 0
        while (c < n) { if (counts(c) > 0) sums(c) /= counts(c); c += 1 }
        sums
    }

    def resize(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
      if (bytes == null || bytes.isEmpty) return None
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) None
        else {
          val out = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g2 = out.createGraphics()
          try {
            g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g2.drawImage(img, 0, 0, w, h, null); ()
          } finally g2.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          Some(bos.toByteArray)
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    /** The stub's byte-stat fold, over decoded LUMINANCES instead of
      * raw file bytes — same contract fields, encoding-invariant. */
    def features(bytes: Array[Byte], dim: Int): Option[(Long, Int, Double, Array[Double])] =
      gray(bytes).map { case (lum, _, _) =>
        val n = lum.length.toLong
        val head = if (lum.nonEmpty) lum(0) else 0
        var sum = 0L
        val feat = new Array[Double](dim)
        var i = 0
        while (i < lum.length) { sum += lum(i); feat(i % dim) += lum(i); i += 1 }
        (n, head, if (n > 0) sum.toDouble / n else 0.0, feat)
      }
  }

  /** One decoded audio chunk: `offset`/`n` in the frontend's own UNITS
    * (raw bytes for the stub, PCM sample frames for [[WavAudio]]),
    * `mean` level, and an exact INTEGER `energy` — the quantity
    * [[silenceSegments]]' cross-multiplied activity predicate needs to
    * stay IEEE-free on either frontend.
    */
  final case class AudioChunk(offset: Long, n: Long, mean: Double, energy: Long)

  /** The audio decode swap point, made explicit exactly like
    * [[MediaDecoder]]: [[chunkAudio]] (m04) and [[silenceSegments]]
    * (m11) take a frontend and default to the deterministic
    * byte-fold stub (the oracle-checkable path, raw-byte semantics
    * unchanged). [[WavAudio]] is the real implementation on
    * `javax.sound.sampled` — zero new dependencies, ships with the
    * JDK. `None` means "not decodable as audio": the operator drops
    * the row (the no-evidence rule), never a failed Spark task.
    */
  trait AudioFrontend extends Serializable {
    /** Fixed-size chunking of the decoded stream, `chunkUnits` units
      * per chunk (last chunk may be short). None = undecodable. */
    def chunks(bytes: Array[Byte], chunkUnits: Int): Option[Array[AudioChunk]]
    /** Decoded per-unit 16-bit amplitudes (|a| ≤ 2^15). The stub
      * recentres raw bytes exactly as [[synthWav]] encodes them
      * ((b − 128) << 8), so stub and real decoder agree on synth
      * input — the m12 oracle-replay property. None = undecodable. */
    def amplitudes(bytes: Array[Byte]): Option[Array[Int]]
  }

  /** Deterministic byte-fold stub — the default and the oracle path.
    * Unit = one raw byte; energy = Σ unsigned bytes (exactly the fold
    * the m04/m11 oracles compute in SQL). */
  object ByteFoldAudio extends AudioFrontend {
    def chunks(bytes: Array[Byte], chunkUnits: Int): Option[Array[AudioChunk]] = {
      if (bytes == null) return None
      val nChunks = math.max(1L, (bytes.length.toLong + chunkUnits - 1) / chunkUnits)
      Some(Array.tabulate(nChunks.toInt) { c =>
        val from = (c.toLong * chunkUnits).toInt
        val until = math.min(bytes.length.toLong, c.toLong * chunkUnits + chunkUnits).toInt
        var s = 0L
        var i = from
        while (i < until) { s += (bytes(i) & 0xff); i += 1 }
        val n = math.max(0, until - from)
        AudioChunk(from.toLong, n.toLong, if (n > 0) s.toDouble / n else 0.0, s)
      })
    }
    def amplitudes(bytes: Array[Byte]): Option[Array[Int]] =
      if (bytes == null) None
      else Some(bytes.map(b => ((b & 0xff) - 128) << 8))
  }

  /** Real audio decode on `javax.sound.sampled` (WAV/AIFF/AU — the
    * JDK service registry decides; compressed codecs need a provider
    * on the classpath). The stream converts to 16-bit signed PCM,
    * channels average to mono, and chunking runs over SAMPLE FRAMES:
    * two containers of the same samples (a 16-bit and an 8-bit WAV of
    * the same waveform) produce the same segmentation, which is the
    * property that makes the VAD cut acoustic rather than
    * byte-cosmetic. mean/energy are Σ|amplitude| folds — integer
    * exact (|s| ≤ 2^15 per frame keeps Long headroom past 2^47
    * frames), so the silence predicate stays cross-multiplied
    * integers on the real path too.
    */
  object WavAudio extends AudioFrontend {
    /** Decoded mono PCM amplitudes (channel-averaged 16-bit). */
    private def pcm(bytes: Array[Byte]): Option[Array[Int]] = {
      if (bytes == null || bytes.isEmpty) return None
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.BufferedInputStream(new java.io.ByteArrayInputStream(bytes)))
        try {
          val base = in.getFormat
          val fmt = new javax.sound.sampled.AudioFormat(
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            base.getSampleRate, 16, base.getChannels, base.getChannels * 2,
            base.getSampleRate, false)
          val dec = javax.sound.sampled.AudioSystem.getAudioInputStream(fmt, in)
          val buf = new java.io.ByteArrayOutputStream()
          val tmp = new Array[Byte](8192)
          var r = dec.read(tmp)
          while (r > 0) { buf.write(tmp, 0, r); r = dec.read(tmp) }
          val raw = buf.toByteArray
          val ch = math.max(1, fmt.getChannels)
          val nFrames = raw.length / (2 * ch)
          val mono = new Array[Int](nFrames)
          var f = 0
          while (f < nFrames) {
            var s = 0
            var c = 0
            while (c < ch) {
              val i = (f * ch + c) * 2
              s += ((raw(i) & 0xff) | (raw(i + 1) << 8)) // little-endian signed
              c += 1
            }
            mono(f) = s / ch
            f += 1
          }
          Some(mono)
        } finally in.close()
      // UnsupportedAudioFileException, truncated headers, bad chunk
      // sizes — all mean "undecodable -> None -> drop the row"
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    def chunks(bytes: Array[Byte], chunkUnits: Int): Option[Array[AudioChunk]] =
      pcm(bytes).map { mono =>
        val nChunks = math.max(1L, (mono.length.toLong + chunkUnits - 1) / chunkUnits)
        Array.tabulate(nChunks.toInt) { c =>
          val from = (c.toLong * chunkUnits).toInt
          val until = math.min(mono.length.toLong, c.toLong * chunkUnits + chunkUnits).toInt
          var e = 0L
          var i = from
          while (i < until) { e += math.abs(mono(i).toLong); i += 1 }
          val n = math.max(0, until - from)
          AudioChunk(from.toLong, n.toLong, if (n > 0) e.toDouble / n else 0.0, e)
        }
      }
    def amplitudes(bytes: Array[Byte]): Option[Array[Int]] = pcm(bytes)
  }

  /** CLIPPING detection (the recording-quality screen an audio
    * curation pipeline runs before transcription/embedding compute:
    * a clipped recording distorts every downstream feature): per
    * file, exact sample/clip counts against an INTEGER amplitude
    * threshold, the peak, and the clipped flag as a pure integer
    * rate comparison (n_clipped·100 > n_samples·ratePct — no IEEE
    * threshold). Runs on the frontend's DECODED amplitudes, so the
    * real path (m12's javax.sound WAV decode) is hash-gated end to
    * end when driven through [[synthWav]]: the oracle replays
    * (byte − 128)·256 from the text alone. Empty/undecodable streams
    * drop (no evidence).
    */
  def clippingStats(df: DataFrame, idCol: String, blobCol: String,
                    clipAbs: Int = 24000, ratePct: Int = 18,
                    frontend: AudioFrontend = ByteFoldAudio): DataFrame = {
    require(clipAbs > 0 && clipAbs <= 32768 && ratePct >= 0 && ratePct <= 100,
      s"clippingStats: clipAbs=$clipAbs ratePct=$ratePct out of range")
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("n_clipped", LongType, nullable = false),
      StructField("peak", LongType, nullable = false)))
    val rowRdd = df.select(col(idCol).cast("long"), col(blobCol))
      .filter(col(idCol).isNotNull).rdd.mapPartitions { it =>
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](1)
        frontend.amplitudes(bytes) match {
          case None => Iterator.empty
          case Some(a) if a.isEmpty => Iterator.empty
          case Some(a) =>
            var nc = 0L
            var pk = 0L
            var i = 0
            while (i < a.length) {
              val v = math.abs(a(i).toLong)
              if (v >= clipAbs) nc += 1
              if (v > pk) pk = v
              i += 1
            }
            Iterator.single(Row(r.getLong(0), a.length.toLong, nc, pk))
        }
      }
    }
    spark.createDataFrame(rowRdd, schema)
      .select(col("id"), col("n_samples"), col("n_clipped"), col("peak"),
        round(col("n_clipped").cast("double")
          / col("n_samples").cast("double"), 6).as("clip_rate"),
        (col("n_clipped") * 100L > col("n_samples") * ratePct.toLong)
          .as("is_clipped"))
  }

  /** Deterministic WAV synthesis from text bytes — the end-to-end
    * harness for the REAL decoder path (m12): sample f is the f-th
    * UTF-8 byte recentred to 16 bits ((b − 128) << 8), wrapped in a
    * canonical 44-byte RIFF/PCM header (16-bit mono, 8 kHz,
    * little-endian — hand-built, so the blob is byte-deterministic
    * across JDKs). The decoded amplitude stream is exactly
    * recoverable from the text bytes, which is the point: a SQL
    * oracle replays the post-decode pipeline from the text WITHOUT
    * parsing WAV, so the whole javax.sound decode path gets a
    * hash-exact gate instead of a spec-only one. Null id/text rows
    * drop (no evidence). Output: (id, wav).
    */
  def synthWav(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("wav", BinaryType, nullable = false)))
    val rowRdd = df.select(col(idCol).cast("long"), col(textCol)).rdd.mapPartitions { it =>
      it.flatMap { r =>
        if (r.isNullAt(0) || r.isNullAt(1)) Iterator.empty
        else {
          val bytes = r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val data = new Array[Byte](bytes.length * 2)
          var i = 0
          while (i < bytes.length) {
            val v = ((bytes(i) & 0xff) - 128) << 8
            data(2 * i) = (v & 0xff).toByte
            data(2 * i + 1) = ((v >> 8) & 0xff).toByte
            i += 1
          }
          val bb = java.nio.ByteBuffer.allocate(44 + data.length)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
            .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
            .putInt(16).putShort(1).putShort(1).putInt(8000).putInt(16000)
            .putShort(2).putShort(16)
            .put("data".getBytes("US-ASCII")).putInt(data.length).put(data)
          Iterator.single(Row(r.getLong(0), bb.array()))
        }
      }
    }
    spark.createDataFrame(rowRdd, schema)
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("head_byte", IntegerType, nullable = false),
    StructField("byte_mean", DoubleType, nullable = false),
    StructField("feature", ArrayType(DoubleType, containsNull = false), nullable = false)
  ))

  /** Deterministic stand-in for a media decoder: fixed-length feature
    * from byte statistics. Replace with the real decoder at
    * deployment; signature (bytes -> features) is the contract.
    */
  def fakeDecode(bytes: Array[Byte], dim: Int = 8): (Long, Int, Double, Array[Double]) = {
    val n = bytes.length.toLong
    val head = if (bytes.nonEmpty) bytes(0) & 0xff else 0
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += (bytes(i) & 0xff); i += 1 }
    val mean = if (n > 0) sum.toDouble / n else 0.0
    val feat = new Array[Double](dim)
    i = 0
    while (i < bytes.length) { feat(i % dim) += (bytes(i) & 0xff); i += 1 }
    (n, head, mean, feat)
  }

  /** Attach a blob column (here derived from text — the testdata has
    * no real media) plus its metadata struct: the shape a real
    * ingest would produce.
    */
  def withBlob(df: DataFrame, textCol: String, format: String = "utf8"): DataFrame =
    df.withColumn("blob", encode(col(textCol), "utf-8"))
      .withColumn("media_meta", struct(
        lit(format).as("format"),
        octet_length(col("blob")).cast("long").as("n_bytes")))

  /** Frame sampling for video-shaped blobs: split the byte stream
    * into `n` evenly spaced "frames" and emit one row per sampled
    * frame with its feature vector — the explode-shaped contract a
    * real decoder (ffmpeg keyframe sampling) would fill in. Runs in
    * the same partition-batched loop as decodeFeatures.
    */
  def sampleFrames(df: DataFrame, idCol: String, blobCol: String,
                   n: Int, dim: Int = 8): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame_bytes", LongType, nullable = false),
      StructField("feature", ArrayType(DoubleType, containsNull = false), nullable = false)))
    val rowRdd = df.select(col(idCol).cast("long"), col(blobCol)).rdd.mapPartitions { it =>
      // real frame decoder would be constructed HERE, once per partition
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val step = math.max(1, bytes.length / math.max(1, n))
        (0 until math.min(n, math.max(1, bytes.length))).iterator.map { f =>
          val from = f * step
          val until = math.min(bytes.length, from + step)
          val frame = java.util.Arrays.copyOfRange(bytes, from, until)
          val (fb, _, _, feat) = fakeDecode(frame, dim)
          Row(r.getLong(0), f, fb, feat.toSeq)
        }
      }
    }
    spark.createDataFrame(rowRdd, outSchema)
  }

  /** Scene-change detection over the sampled frame stream — the
    * shot-boundary step a video curation pipeline runs before
    * per-scene sampling/captioning: adjacent frames' feature vectors
    * differ by squared L2, and a distance above `tau2` marks a
    * boundary. The features are [[sampleFrames]]' partition-batched
    * stub fold (exact INTEGER byte sums, so dist² is exact BIGINT
    * arithmetic and the whole operator is oracle-exact; a real
    * decoder swaps in at the same point and the lag/threshold
    * plumbing is unchanged). One id-keyed lag window over the
    * ≤n-frames-per-video frame stream; first frames have no previous
    * and emit nothing. Output: (id, frame_idx, dist2, is_boundary).
    */
  def sceneChanges(df: DataFrame, idCol: String, blobCol: String,
                   n: Int, tau2: Long, dim: Int = 8): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("frame_idx"))
    sampleFrames(df, idCol, blobCol, n, dim)
      .withColumn("_prev", lag(col("feature"), 1).over(W))
      .filter(col("_prev").isNotNull)
      .withColumn("dist2", aggregate(
        zip_with(col("feature"), col("_prev"), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x).cast("long"))
      .select(col("id"), col("frame_idx").cast("long").as("frame_idx"),
        col("dist2"), (col("dist2") > tau2).as("is_boundary"))
  }

  /** KEYFRAME selection per scene — the step after [[sceneChanges]]
    * in a video curation pipeline (caption/embed ONE representative
    * frame per shot, not every frame): boundaries split each video's
    * frame sequence into scenes (scene id = running boundary count,
    * frame 0 opens scene 0), and within each scene the keyframe is
    * the frame with the highest feature ENERGY (Σ v_j² — the
    * stub-fold proxy for the sharpness/contrast argmax real
    * pipelines use; a real decoder swaps in at [[sampleFrames]]'
    * swap point and this plumbing is unchanged), ties to the
    * earliest frame. Energy and the boundary distances are exact
    * BIGINT arithmetic over the integer byte-fold features, so the
    * whole operator is oracle-exact.
    *
    * Shape at scale: everything runs on the ≤n-frames-per-video
    * frame stream — the lag/cumsum/rank windows are id-keyed over
    * that tiny frame (the m08 contract), never the blob bytes.
    * Output: (id, scene, n_frames, keyframe_idx, energy).
    */
  def keyframes(df: DataFrame, idCol: String, blobCol: String,
                n: Int, tau2: Long, dim: Int = 8): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val byId = W.partitionBy(col("id")).orderBy(col("frame_idx"))
    val byScene = W.partitionBy(col("id"), col("scene"))
    val scenes = sampleFrames(df, idCol, blobCol, n, dim)
      .withColumn("_prev", lag(col("feature"), 1).over(byId))
      .withColumn("_d2", aggregate(
        zip_with(col("feature"), coalesce(col("_prev"), col("feature")),
          (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x).cast("long"))
      .withColumn("scene", sum(when(col("_prev").isNotNull &&
          col("_d2") > tau2, 1L).otherwise(0L))
        .over(byId.rowsBetween(W.unboundedPreceding, W.currentRow)))
      .withColumn("energy", aggregate(
        transform(col("feature"), v => v * v),
        lit(0.0), (acc, x) => acc + x).cast("long"))
    scenes
      .withColumn("_rn", row_number().over(
        byScene.orderBy(col("energy").desc, col("frame_idx"))))
      .withColumn("n_frames", count(lit(1)).over(byScene))
      .filter(col("_rn") === 1)
      .select(col("id"), col("scene"), col("n_frames"),
        col("frame_idx").cast("long").as("keyframe_idx"), col("energy"))
  }

  /** Resize stub: the Spark-side contract of an image resize — one
    * output row per input with target dims and the resized payload
    * (here truncated to w*h bytes; a real impl swaps in the scaler).
    * Partition-batched like decodeFeatures so the real library inits
    * once per partition.
    */
  def resizeStub(df: DataFrame, idCol: String, blobCol: String,
                 w: Int, h: Int,
                 decoder: MediaDecoder = ByteFoldDecoder): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false),
      StructField("in_bytes", LongType, nullable = false),
      StructField("out_bytes", LongType, nullable = false),
      StructField("resized", BinaryType, nullable = false)))
    val rowRdd = df.select(col(idCol).cast("long"), col(blobCol)).rdd.mapPartitions { it =>
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](1)
        decoder.resize(bytes, w, h).map(out =>
          Row(r.getLong(0), w.toLong, h.toLong, bytes.length.toLong,
            out.length.toLong, out)).iterator
      }
    }
    spark.createDataFrame(rowRdd, outSchema)
  }

  /** Audio SEGMENT overlap — the audio-dedup crossover beside m05's
    * image pairs: fixed-size chunks of each blob (m04's chunking
    * grid) fingerprint by md5, and two files pair with the count of
    * DISTINCT chunk contents they share — "this jingle/segment
    * appears in both recordings", the d01-exact analogue at chunk
    * granularity. Matching is content-keyed, not position-keyed, so
    * a shared segment is found at ANY block-aligned offset; the
    * distinct-per-file step keeps a repeated chunk (digital silence)
    * from quadratically inflating a pair's count. Block alignment is
    * the documented limit: a segment shifted by a non-multiple of
    * `chunkBytes` needs the winnowing family (d17) on a byte-shingle
    * stream instead — this operator is the cheap aligned screen.
    *
    * Shape at scale: one narrow chunk explode (output ∝ corpus
    * bytes / chunkBytes), md5 collapses every join key to 16 bytes
    * (the shuffle never carries audio), and the pair join runs on
    * the fp key where only files sharing content collide. Empty
    * blobs and null ids drop (no evidence). Output:
    * (id1, id2, n_shared).
    */
  def audioChunkOverlap(df: DataFrame, idCol: String, blobCol: String,
                        chunkBytes: Int, minShared: Long = 1L): DataFrame = {
    require(chunkBytes > 0, s"audioChunkOverlap: chunkBytes $chunkBytes")
    val n = octet_length(col(blobCol))
    val fps = df
      .filter(col(idCol).isNotNull && col(blobCol).isNotNull && n > 0)
      .select(col(idCol).cast("long").as("id"), col(blobCol).as("_b"),
        explode(sequence(lit(0),
          ((n + lit(chunkBytes - 1)) / lit(chunkBytes)).cast("int") - 1))
          .as("_c"))
      .select(col("id"), md5(expr(
        s"substring(_b, cast(_c as int) * $chunkBytes + 1, $chunkBytes)"))
        .as("_fp"))
      .distinct()
    val a = fps.select(col("id").as("id1"), col("_fp"))
    val b = fps.select(col("id").as("id2"), col("_fp"))
    a.join(b, Seq("_fp")).filter(col("id1") < col("id2"))
      .groupBy("id1", "id2").agg(count(lit(1)).cast("long").as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Audio-shaped contract: split the byte stream into fixed-size
    * chunks (a real pipeline chunks by duration at a sample rate) and
    * emit per-chunk byte stats — the explode-shaped rows a feature
    * extractor (fbank/MFCC) would consume. Partition-batched like the
    * other decode stubs so a real resampler inits once per partition.
    */
  def chunkAudio(df: DataFrame, idCol: String, blobCol: String,
                 chunkBytes: Int,
                 frontend: AudioFrontend = ByteFoldAudio): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("chunk_idx", LongType, nullable = false),
      StructField("offset", LongType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("byte_mean", DoubleType, nullable = false)))
    val rowRdd = df.select(col(idCol).cast("long"), col(blobCol)).rdd.mapPartitions { it =>
      // the frontend is a singleton module: any heavy decoder state
      // constructs once per executor JVM, amortized across partitions
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](1)
        frontend.chunks(bytes, chunkBytes) match {
          case None => Iterator.empty // null/undecodable: no chunks, no NPE
          case Some(cs) => cs.iterator.zipWithIndex.map { case (ck, c) =>
            Row(r.getLong(0), c.toLong, ck.offset, ck.n, ck.mean)
          }
        }
      }
    }
    spark.createDataFrame(rowRdd, outSchema)
  }

  /** SILENCE-gap SEGMENTATION (the VAD-shaped cut every audio
    * pipeline runs before transcription/embedding: split a recording
    * into active segments separated by quiet): chunks whose exact
    * byte-energy exceeds `numThresh/denThresh` of the file's mean
    * chunk energy are active; maximal runs of consecutive active
    * chunks become segments (the islands cumsum — chunk_idx minus
    * rank). The byte-energy fold is the chunkAudio decode stand-in —
    * a real frame-energy frontend swaps in at the same mapPartitions
    * point, plumbing unchanged. A short tail chunk carries fewer
    * bytes, hence less energy — partial audio IS quieter, the
    * semantics compose.
    *
    * Shape at scale: one partition-batched chunk fold (output ∝
    * bytes/chunkBytes), one id-keyed total aggregate joined back, and
    * id-partitioned windows at CHUNK grain (bounded per file) — the
    * corpus never windows. The active predicate is an exact-integer
    * cross-multiplication (e·den·nChunks > num·total), no IEEE mean.
    * Output: (id, seg_idx, start_chunk, end_chunk, n_chunks).
    */
  def silenceSegments(df: DataFrame, idCol: String, blobCol: String,
                      chunkBytes: Int, numThresh: Int = 3,
                      denThresh: Int = 4,
                      frontend: AudioFrontend = ByteFoldAudio): DataFrame = {
    require(chunkBytes > 0, s"silenceSegments: chunkBytes $chunkBytes")
    require(numThresh >= 0 && denThresh >= 1,
      s"silenceSegments: bad threshold $numThresh/$denThresh")
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("chunk_idx", LongType, nullable = false),
      StructField("e", LongType, nullable = false)))
    val rowRdd = df.select(col(idCol).cast("long"), col(blobCol)).rdd
      .mapPartitions { it =>
        // frontend is the m04 swap point: [[WavAudio]] supplies REAL
        // per-chunk frame energies here, the stub the byte fold — the
        // segmentation below is shared either way
        it.flatMap { r =>
          val bytes = r.getAs[Array[Byte]](1)
          frontend.chunks(bytes, chunkBytes) match {
            case None => Iterator.empty
            case Some(cs) => cs.iterator.zipWithIndex.map { case (ck, c) =>
              Row(r.getLong(0), c.toLong, ck.energy)
            }
          }
        }
      }
    val chunks = spark.createDataFrame(rowRdd, schema)
    val tot = chunks.groupBy(col("id"))
      .agg(sum(col("e")).as("_tot"), count(lit(1)).as("_nc"))
    val wIdx = Window.partitionBy(col("id")).orderBy(col("chunk_idx"))
    chunks.join(tot, "id")
      .filter(col("e") * lit(denThresh.toLong) * col("_nc") >
        lit(numThresh.toLong) * col("_tot"))
      .withColumn("_isl", col("chunk_idx") - row_number().over(wIdx))
      .groupBy(col("id"), col("_isl"))
      .agg(min(col("chunk_idx")).as("start_chunk"),
        max(col("chunk_idx")).as("end_chunk"),
        count(lit(1)).as("n_chunks"))
      .withColumn("seg_idx", row_number()
        .over(Window.partitionBy(col("id")).orderBy(col("start_chunk")))
        .cast("long"))
      .select(col("id"), col("seg_idx"), col("start_chunk"),
        col("end_chunk"), col("n_chunks"))
  }

  /** Perceptual-hash contract for image-shaped blobs: a 64-bit
    * dHash-style fingerprint per image, carried as four 16-bit chunks
    * (f0..f3) so the pair stage and the SQL oracle share the d12
    * pigeonhole arithmetic ([[Dedup.chunkedHammingPairs]]) — a
    * 64-bit value itself would overflow BIGINT construction in an
    * external engine when bit 63 is set.
    *
    * The decode is the deterministic byte-fold STUB (this container
    * has no image libs): cell[j] = Σ bytes at positions ≡ j (mod
    * 64) — the stand-in for an 8x8 grayscale resize — and bit j
    * compares cell[j] > cell[(j+1) mod 64], the neighbor-gradient
    * comparison a real dHash makes. Swap the fold for
    * decode+resize+gradient (or DCT for pHash) at deployment; the
    * (blob -> 4 chunk) signature and partition-batched execution are
    * the contract. Null blobs AND null ids drop (no fingerprint, no
    * pairs — the no-evidence rule for dirty input; a null id would
    * otherwise NPE in the row extraction).
    */
  def imagePhash(df: DataFrame, idCol: String, blobCol: String,
                 decoder: MediaDecoder = ByteFoldDecoder): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(
      StructField("id", LongType, nullable = false) +:
        (0 to 3).map(k => StructField(s"f$k", IntegerType, nullable = false)))
    val rowRdd = df.select(col(idCol).cast("long"), col(blobCol))
      .filter(col(idCol).isNotNull).rdd.mapPartitions { it =>
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](1)
        decoder.cells(bytes, 64) match {
          case None => Iterator.empty // null/undecodable: no fingerprint
          case Some(cells) =>
            val chunks = new Array[Int](4)
            var j = 0
            while (j < 64) {
              if (cells(j) > cells((j + 1) % 64)) chunks(j / 16) |= 1 << (15 - (j % 16))
              j += 1
            }
            Iterator.single(Row(r.getLong(0), chunks(0), chunks(1), chunks(2), chunks(3)))
        }
      }
    }
    spark.createDataFrame(rowRdd, outSchema)
  }

  /** Per-image CELL STATISTICS (the flat/blank-image screen a media
    * curation pipeline runs before spending decode/embed compute: a
    * near-constant image — a solid color, a blank scan — carries no
    * signal): over the decoder's `n` grayscale cells, exact integer
    * mean/contrast and the flat flag as a PURE INTEGER comparison
    * ((max−min)·20 < mean, i.e. relative contrast < 5% — no IEEE
    * threshold anywhere; the q65 boundary lesson applied to images).
    * The real-decoder swap point is the same as [[imagePhash]]'s:
    * ImageIoDecoder pools decoded pixels, the byte-fold stub is the
    * oracle path.
    */
  def cellStats(df: DataFrame, idCol: String, blobCol: String,
                n: Int = 64,
                decoder: MediaDecoder = ByteFoldDecoder): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("cell_sum", LongType, nullable = false),
      StructField("cell_min", LongType, nullable = false),
      StructField("cell_max", LongType, nullable = false)))
    val rowRdd = df.select(col(idCol).cast("long"), col(blobCol))
      .filter(col(idCol).isNotNull).rdd.mapPartitions { it =>
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](1)
        decoder.cells(bytes, n) match {
          case None => Iterator.empty
          case Some(cells) =>
            Iterator.single(Row(r.getLong(0), cells.sum, cells.min, cells.max))
        }
      }
    }
    spark.createDataFrame(rowRdd, outSchema)
      .select(col("id"),
        round(col("cell_sum").cast("double") / lit(n.toDouble), 6)
          .as("cell_mean"),
        (col("cell_max") - col("cell_min")).as("contrast"),
        ((col("cell_max") - col("cell_min")) * lit(20L) * lit(n.toLong)
          < col("cell_sum")).as("is_flat"))
  }

  /** Text–image alignment scoring (the plumbing of LAION/DataComp
    * CLIP-score filtering — the step that drops image–caption pairs
    * whose modalities don't agree): cosine between the image's
    * decoded feature vector and the text embedding projected into
    * the same feature space, plus the keep flag at `tau`.
    *
    * Both towers are STUBS with the real swap points documented: the
    * image side is [[decodeFeatures]]' partition-batched byte fold
    * (a real image tower replaces fakeDecode), the text side
    * projects through the s08 md5-parity sign matrix (a learned
    * projection head replaces the signs; the matrix is portable so
    * the whole score is oracle-checkable). A zero-norm side (empty
    * blob, zero text vector) yields a NULL score and a NULL keep —
    * the no-evidence rule: the gate decision surfaces, it is not
    * silently asserted either way.
    *
    * Shape at scale: decode is a narrow partition-batched pass; the
    * projection is `dim` fused VecDot evaluations against literal
    * sign vectors (zero shuffles, the s08 device); then ONE id-key
    * equi-join and a row-local cosine. Output: (id, align_cos, keep).
    */
  def textImageAlignment(blobs: DataFrame, idCol: String, blobCol: String,
                         emb: DataFrame, embIdCol: String, vecCol: String,
                         tau: Double, embDims: Int, dim: Int = 8): DataFrame = {
    val signVecs = Similarity.srpSigns(embDims, dim)
    val img = decodeFeatures(blobs, idCol, blobCol, dim)
      .select(col("id"), col("feature").as("_f"))
    val txt = emb.select(col(embIdCol).cast("long").as("id"),
      array((0 until dim).map(j =>
        round(graft.functions.VecDot.dot(col(vecCol), lit(signVecs(j))), 6)): _*)
        .as("_t"))
    val dot = graft.functions.VecDot.dot(col("_f"), col("_t"))
    val nf = sqrt(graft.functions.VecDot.dot(col("_f"), col("_f")))
    val nt = sqrt(graft.functions.VecDot.dot(col("_t"), col("_t")))
    img.join(txt, "id")
      .withColumn("align_cos",
        when(nf > 0.0 && nt > 0.0, round(dot / (nf * nt), 6)))
      .withColumn("keep", col("align_cos") >= tau)
      .select(col("id"), col("align_cos"), col("keep"))
  }

  /** Partition-batched decode: mapPartitions so a real decoder inits
    * once per partition. Returns (id, n_bytes, head_byte, byte_mean,
    * feature[dim]).
    */
  def decodeFeatures(df: DataFrame, idCol: String, blobCol: String,
                     dim: Int = 8,
                     decoder: MediaDecoder = ByteFoldDecoder): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(
      StructField("id", LongType, nullable = false) +: featureSchema.fields.toSeq)
    val rowRdd = df.select(col(idCol).cast("long"), col(blobCol)).rdd.mapPartitions { it =>
      it.flatMap { r =>
        decoder.features(r.getAs[Array[Byte]](1), dim).map { case (n, head, mean, feat) =>
          Row(r.getLong(0), n, head, mean, feat.toSeq)
        }.iterator
      }
    }
    spark.createDataFrame(rowRdd, outSchema)
  }
}
