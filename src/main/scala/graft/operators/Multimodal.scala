package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque binary payloads + typed metadata,
  * decoded/feature-extracted in partition batches.
  *
  * Two decoders behind one seam: [[ImageIoDecoder]] really decodes
  * PNG/JPEG/GIF/BMP payloads (javax.imageio — public JDK API, no native
  * deps) into dimensions + channel-mean features; [[StubDecoder]] is the
  * deterministic fallback for payloads that are not images (the
  * synthetic testdata's binary blobs, video containers this JDK can't
  * parse). Everything around the seam — the schema contract, the
  * partition-batched invocation (one decoder instance per partition, the
  * mapInPandas batch shape in Scala form), the output column layout — is
  * shared, so swapping in a JNI/JavaCV video codec again only replaces
  * the [[Decoder]] implementation.
  */
object Multimodal {

  /** One decoded frame: dimensions + a small feature vector. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false),
      nullable = false)))

  trait Decoder extends Serializable {
    /** Decode one payload; called from executor partitions. */
    def decode(payload: Array[Byte]): Row
  }

  /** STUB: a real implementation would parse the container format and
    * run the codec. This fake derives deterministic dimensions from the
    * byte length and a 4-float "embedding" from byte statistics, so the
    * plumbing (batching, schema, partitioning) is exercised honestly. */
  object StubDecoder extends Decoder {
    def decode(payload: Array[Byte]): Row = {
      val w = payload.length % 64 + 1
      val h = payload.length / 64 + 1
      var s0 = 0L; var s1 = 0L
      var i = 0
      while (i < payload.length) {
        s0 += payload(i) & 0xff
        s1 ^= (payload(i) & 0xffL) << ((i % 8) * 8)
        i += 1
      }
      val n = math.max(payload.length, 1)
      Row(w, h, 1, Seq(
        (s0.toDouble / n).toFloat, (s1 & 0xffff).toFloat,
        ((s1 >>> 16) & 0xffff).toFloat, n.toFloat))
    }
  }

  /** Real image decode via javax.imageio (PNG/JPEG/GIF/BMP — the JDK's
    * built-in readers): width/height from the decoded raster, features =
    * [mean R, mean G, mean B, pixel count]. The channel sums are exact
    * integers, so the means are deterministic across partitionings.
    * Payloads imageio cannot parse (not an image, or a codec this JDK
    * lacks) fall back to [[StubDecoder]] — decode never throws on a bad
    * payload, it degrades to the deterministic fake (a 100 TB pipeline
    * must not die on one corrupt blob; filter on n_frames/width
    * downstream if strictness is wanted). */
  object ImageIoDecoder extends Decoder {
    def decode(payload: Array[Byte]): Row = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) StubDecoder.decode(payload)
      else {
        val w = img.getWidth; val h = img.getHeight
        var r = 0L; var g = 0L; var b = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            r += (p >>> 16) & 0xff; g += (p >>> 8) & 0xff; b += p & 0xff
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        Row(w, h, 1, Seq(
          (r.toDouble / n).toFloat, (g.toDouble / n).toFloat,
          (b.toDouble / n).toFloat, n.toFloat))
      }
    }
  }

  /** Frame sampling: a "video" payload → one row per sampled frame
    * (every `everyNth` of the payload's frames, always including frame
    * 0) — the 1→N generator shape over binary columns. The codec is
    * stubbed: fixed-size payload slices stand in for decoded frames,
    * each with its own deterministic feature vector; a real decoder
    * replaces [[frameOf]] only. Output: (id, frame_idx, width, height,
    * features). */
  private val FrameBytes = 256

  private def frameOf(payload: Array[Byte], idx: Int): Array[Byte] =
    java.util.Arrays.copyOfRange(payload,
      math.min(idx * FrameBytes, payload.length),
      math.min((idx + 1) * FrameBytes, payload.length))

  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String,
      everyNth: Int = 10, decoder: Decoder = StubDecoder): DataFrame = {
    require(everyNth >= 1, "everyNth must be >= 1")
    require(df.schema(idCol).dataType == LongType,
      s"$idCol must be LongType, got ${df.schema(idCol).dataType}")
    require(df.schema(payloadCol).dataType == BinaryType,
      s"$payloadCol must be BinaryType, got ${df.schema(payloadCol).dataType}")
    val outSchema = StructType(
      StructField("id", LongType, nullable = false) +:
      StructField("frame_idx", IntegerType, nullable = false) +:
      decodedSchema.fields)
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { batch =>
      val d = decoder
      batch.flatMap { r =>
        val payload = r.getAs[Array[Byte]](pIdx)
        val nFrames = math.max(1, (payload.length + FrameBytes - 1) / FrameBytes)
        Iterator.range(0, nFrames, everyNth).map { f =>
          val decoded = d.decode(frameOf(payload, f))
          Row.fromSeq(r.getLong(idIdx) +: f +: decoded.toSeq)
        }
      }
    }(enc)
  }

  /** Resize: decoded frames → fixed target dimensions with the feature
    * vector rescaled deterministically (the stub stand-in for an actual
    * pixel resample — a pure 1→1 column transform, so it runs inside the
    * same partition batch as the decode). Expects decodeBatches /
    * sampleFrames output columns. */
  def resize(df: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    require(targetW >= 1 && targetH >= 1,
      s"target dimensions must be positive, got ${targetW}x$targetH")
    import org.apache.spark.sql.functions._
    val sx = col("width").cast("double") / targetW
    val sy = col("height").cast("double") / targetH
    // divide in double space, then cast back so the features column keeps
    // its declared ArrayType(FloatType) (decodedSchema contract — resized
    // and un-resized frames must union/store interchangeably)
    df.withColumn("features",
        transform(col("features"),
          f => (f.cast("double") / sqrt(sx * sy)).cast("float")))
      .withColumn("width", lit(targetW))
      .withColumn("height", lit(targetH))
  }

  // ---- audio -----------------------------------------------------------

  /** One decoded audio clip: format header fields + exact-integer PCM
    * statistics. Sums/peaks/zero-crossings are integers, so the stats
    * are deterministic across partitionings; consumers derive mean/RMS
    * with a single final division. */
  val audioSchema: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("s_sum", LongType, nullable = false),
    StructField("s_peak", LongType, nullable = false),
    StructField("zcross", LongType, nullable = false)))

  trait AudioDecoder extends Serializable {
    /** Decode one audio payload; called from executor partitions. */
    def decode(payload: Array[Byte]): Row
  }

  /** Deterministic non-audio fallback (the audio [[StubDecoder]]):
    * treats raw bytes as centered 16-bit samples. sample_rate 0 marks
    * "container not parsed" for downstream filtering. */
  object StubAudioDecoder extends AudioDecoder {
    def decode(payload: Array[Byte]): Row = {
      var sum = 0L; var peak = 0L; var z = 0L; var prev = 0L
      var i = 0
      while (i < payload.length) {
        val v = ((payload(i) & 0xff) - 64).toLong * 256
        sum += v; if (math.abs(v) > peak) peak = math.abs(v)
        if (i > 0 && prev * v < 0) z += 1
        prev = v; i += 1
      }
      Row(0, 0, payload.length.toLong, sum, peak, z)
    }
  }

  /** Real audio decode via javax.sound.sampled (WAV/AIFF/AU — the JDK's
    * built-in container parsers, no native deps): sample rate and
    * channel count from the parsed AudioFormat header, statistics over
    * the signed 16-bit PCM stream (endianness per the header).
    * n_samples counts every sample across interleaved channels.
    * Payloads the JDK cannot parse (or non-16-bit encodings) degrade to
    * [[StubAudioDecoder]] — decode never throws on a bad payload. */
  object WavDecoder extends AudioDecoder {
    def decode(payload: Array[Byte]): Row = {
      val in =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        catch { case scala.util.control.NonFatal(_) => null }
      if (in == null) StubAudioDecoder.decode(payload)
      else try {
        val fmt = in.getFormat
        val pcm16 =
          fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
            fmt.getSampleSizeInBits == 16
        if (!pcm16) StubAudioDecoder.decode(payload)
        else {
          val bytes = in.readAllBytes()
          val be = fmt.isBigEndian
          var i = 0; var n = 0L; var sum = 0L; var peak = 0L; var z = 0L
          var prev = 0L
          while (i + 1 < bytes.length) {
            val v: Long =
              (if (be) ((bytes(i) << 8) | (bytes(i + 1) & 0xff))
               else ((bytes(i + 1) << 8) | (bytes(i) & 0xff))).toShort.toLong
            sum += v; if (math.abs(v) > peak) peak = math.abs(v)
            if (n > 0 && prev * v < 0) z += 1
            prev = v; n += 1; i += 2
          }
          Row(fmt.getSampleRate.toInt, fmt.getChannels, n, sum, peak, z)
        }
      } finally in.close()
    }
  }

  /** Minimal RIFF/WAVE container for 16-bit signed little-endian mono
    * PCM — the synthetic-payload side of the audio path (tests and the
    * driver query build payloads with it; [[WavDecoder]] must round-trip
    * the samples exactly). */
  def pcmWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2) // byte rate
      .putShort(2).putShort(16) // block align, bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => { buf.putShort(s); () })
    buf.array()
  }

  /** Decode an audio binary column, partition-batched like
    * [[decodeBatches]]. Input: (id LONG, payload BINARY). */
  def decodeAudioBatches(df: DataFrame, idCol: String, payloadCol: String,
      decoder: AudioDecoder = WavDecoder): DataFrame = {
    val outSchema = StructType(
      StructField("id", LongType, nullable = false) +: audioSchema.fields)
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { batch =>
      val d = decoder
      batch.map { r =>
        val decoded = d.decode(r.getAs[Array[Byte]](pIdx))
        Row.fromSeq(r.getLong(idIdx) +: decoded.toSeq)
      }
    }(enc)
  }

  /** Decode a binary column into typed media columns, partition-batched:
    * the decoder is instantiated once per partition and applied to the
    * batch iterator (the Scala analogue of a pandas_udf over
    * mapInPandas). Input: (id LONG, payload BINARY). */
  def decodeBatches(df: DataFrame, idCol: String, payloadCol: String,
      decoder: Decoder = StubDecoder): DataFrame = {
    val outSchema = StructType(
      StructField("id", LongType, nullable = false) +: decodedSchema.fields)
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { batch =>
      // per-partition decoder setup happens here (codec init, buffers)
      val d = decoder
      batch.map { r =>
        val decoded = d.decode(r.getAs[Array[Byte]](pIdx))
        Row.fromSeq(r.getLong(idIdx) +: decoded.toSeq)
      }
    }(enc)
  }
}
