package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video payloads ride through the
  * pipeline as opaque `binary` columns with a typed metadata struct; heavy
  * per-item work (decode, feature-extract, resize, frame-sample) runs as a
  * batched `mapPartitions` over the binary column — the Scala analog of a
  * Pandas-UDF-over-`mapInPandas` stage: per-partition setup cost amortized
  * across rows, no driver involvement, scales with partition count.
  *
  * The actual media decode is STUBBED (`StubDecoder`): the container has no
  * image/audio codecs, so the decoder is an injected function and the
  * default produces deterministic fake features. The Spark-side plumbing —
  * schema, batching, partitioning, output shape — is real and tested.
  */
object Multimodal {

  /** Metadata carried alongside every binary payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("mime", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("source_id", LongType, nullable = false)))

  /** Wrap a string column as a binary payload + metadata struct — the shape
    * a real ingest (image bytes from object storage) would produce. */
  def withPayload(df: DataFrame, textCol: String, idCol: String,
                  mime: String = "text/plain"): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8"))
      .withColumn("meta", struct(
        lit(mime).as("mime"),
        length(col("payload")).cast("long").as("n_bytes"),
        col(idCol).cast("long").as("source_id")))

  /** A decoder turns raw bytes into a fixed-width feature vector.
    * Swap in a real image/audio decoder at deployment; the pipeline shape
    * (binary in, float vector out, batch-amortized setup) is unchanged. */
  type Decoder = Array[Byte] => Array[Float]

  /** Deterministic stand-in for the absent media codecs: length, head/tail
    * bytes, and a simple additive checksum. NOT a real decode — marked stub. */
  val StubDecoder: Decoder = { bytes =>
    if (bytes == null || bytes.isEmpty) Array(0f, 0f, 0f, 0f)
    else {
      var checksum = 0L
      var i = 0
      while (i < bytes.length) { checksum += bytes(i) & 0xff; i += 1 }
      Array(bytes.length.toFloat, (bytes(0) & 0xff).toFloat,
        (bytes(bytes.length - 1) & 0xff).toFloat, (checksum % 997L).toFloat)
    }
  }

  /** The video-shaped stage: per payload, (stub-)resize → sample `k`
    * frames → decode each frame, all inside ONE batched `mapPartitions`
    * (a real pipeline decodes and embeds frames in a single stage so the
    * codec's per-partition setup is paid once, and the k× row fan-out
    * happens executor-side — never through the driver or a shuffle).
    *
    * Stubs, each honestly fake but byte-deterministic so the whole stage is
    * oracle-checkable end to end:
    *  - resize: truncate to `resizeTo` bytes or zero-pad up to it (a real
    *    image resize is a codec call with the same bytes-in/bytes-out
    *    shape); skipped when `resizeTo` ≤ 0;
    *  - frame j of k: the contiguous byte slice [n·j/k, n·(j+1)/k) (a real
    *    video codec seeks keyframes);
    *  - per-frame features: [[StubDecoder]].
    * Output: (id, frame_idx, feature array<float>).
    */
  def frameFeatures(df: DataFrame, idCol: String, payloadCol: String,
                    k: Int, resizeTo: Int = 0,
                    decoder: Decoder = StubDecoder): DataFrame = {
    require(k > 0, s"frameFeatures: k must be positive, got $k")
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("frame_idx", LongType, nullable = false),
      StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false)))
    val projected = df.select(col(idCol).cast("long"), col(payloadCol))
    projected.mapPartitions { rows =>
      // per-partition codec setup happens here in a real deployment
      rows.flatMap { r =>
        val id = r.getLong(0)
        val raw = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        val bytes =
          if (resizeTo <= 0) raw
          else if (raw.length >= resizeTo) raw.take(resizeTo)
          else raw ++ Array.fill[Byte](resizeTo - raw.length)(0)
        val n = bytes.length
        (0 until k).iterator.map { j =>
          val frame = bytes.slice((n.toLong * j / k).toInt, (n.toLong * (j + 1) / k).toInt)
          Row(id, j.toLong, decoder(frame).toSeq)
        }
      }
    }(RowEncoder.encoderFor(outSchema)).toDF("id", "frame_idx", "feature")
  }

  /** The audio-shaped stage: segment each payload into fixed-`win`-byte
    * windows (hop = win) and emit one integer ENERGY per window —
    * Σ (byte−128)², the RMS-loudness profile a real audio pipeline
    * computes over PCM samples — inside the same batched `mapPartitions`
    * shape as [[frameFeatures]] (codec setup per partition, k× fan-out
    * executor-side, no shuffle, no driver). The windowing is real; only
    * the sample decode is the identity byte read (the container has no
    * audio codecs — a real deployment swaps the inner loop for decoded
    * PCM). `maxWindows` caps the head sample per payload so downstream
    * frames stay bounded. Output: (id, win_idx, n_bytes, energy), all
    * integer-exact for the byte-level SQL oracle. */
  def windowedEnergy(df: DataFrame, idCol: String, payloadCol: String,
                     win: Int, maxWindows: Int): DataFrame = {
    require(win > 0, s"windowedEnergy: win must be positive, got $win")
    require(maxWindows > 0,
      s"windowedEnergy: maxWindows must be positive, got $maxWindows")
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("win_idx", LongType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("energy", LongType, nullable = false)))
    val projected = df.select(col(idCol).cast("long"), col(payloadCol))
    projected.mapPartitions { rows =>
      // per-partition codec setup happens here in a real deployment
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        val nWin = math.min((bytes.length + win - 1) / win, maxWindows)
        (0 until nWin).iterator.map { j =>
          val s = j * win
          val e = math.min(s + win, bytes.length)
          var energy = 0L
          var i = s
          while (i < e) {
            val d = (bytes(i) & 0xff) - 128L
            energy += d * d
            i += 1
          }
          Row(id, j.toLong, (e - s).toLong, energy)
        }
      }
    }(RowEncoder.encoderFor(outSchema)).toDF("id", "win_idx", "n_bytes", "energy")
  }

  /** The image-shaped fingerprint stage: a DIFFERENCE HASH (dHash) over
    * the resized payload — bit i set iff byte i > byte i+1, the
    * gradient-sign fingerprint image dedup pipelines compute over
    * downscaled pixel rows. `resizeTo` bytes give `resizeTo−1` hash bits
    * (keep ≤ 57 so the hash stays a non-negative BIGINT for the SQL
    * oracle). Same batched `mapPartitions` shape as [[frameFeatures]];
    * only the pixel decode is the identity byte read (stub — no image
    * codecs in the container). Output: (id, dhash, popcnt), all
    * integer-exact. */
  def dHash(df: DataFrame, idCol: String, payloadCol: String,
            resizeTo: Int): DataFrame = {
    require(resizeTo >= 2 && resizeTo <= 57,
      s"dHash: resizeTo must be in [2,57] for a sign-safe hash, got $resizeTo")
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("dhash", LongType, nullable = false),
      StructField("popcnt", LongType, nullable = false)))
    val projected = df.select(col(idCol).cast("long"), col(payloadCol))
    projected.mapPartitions { rows =>
      // per-partition codec setup happens here in a real deployment
      rows.map { r =>
        val id = r.getLong(0)
        val raw = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        val bytes =
          if (raw.length >= resizeTo) raw.take(resizeTo)
          else raw ++ Array.fill[Byte](resizeTo - raw.length)(0)
        var h = 0L
        var i = 0
        while (i < resizeTo - 1) {
          if ((bytes(i) & 0xff) > (bytes(i + 1) & 0xff)) h |= 1L << i
          i += 1
        }
        Row(id, h, java.lang.Long.bitCount(h).toLong)
      }
    }(RowEncoder.encoderFor(outSchema)).toDF("id", "dhash", "popcnt")
  }

  /** Batched feature extraction over a binary column via `mapPartitions`:
    * the decoder is constructed once per partition (where a real codec
    * would load its native state), then streamed over the partition's rows.
    * Output: (id, feature array<float>).
    */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String,
                      decoder: Decoder = StubDecoder): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false)))
    val projected = df.select(col(idCol).cast("long"), col(payloadCol))
    projected.mapPartitions { rows =>
      // per-partition decoder setup happens here in a real deployment
      rows.map { r => Row(r.getLong(0), decoder(r.getAs[Array[Byte]](1)).toSeq) }
    }(RowEncoder.encoderFor(outSchema)).toDF("id", "feature")
  }

  /** Byte-CLASS histogram per payload over the head `maxBytes` bytes —
    * class = high nibble (16 classes), the cheap content-type profile a
    * media ingest uses to spot mislabeled/corrupt payloads (text clusters
    * in 0x2–0x7, compressed media is near-uniform) without any codec.
    * Same batched `mapPartitions` shape as [[frameFeatures]]: one 16-cell
    * array per row, fan-out executor-side, all counts integer-exact for
    * the hex-nibble SQL oracle. Output: (id, cls, n), absent classes
    * omitted. */
  /** Shared per-payload byte histogram: one `bins`-cell array per row,
    * fan-out executor-side (the [[frameFeatures]] mapPartitions shape),
    * absent bins omitted; `binOf` maps a byte (0-255) to its bin. Both
    * public facades below delegate here so fixes land once. */
  private def byteHistogram(df: DataFrame, idCol: String, payloadCol: String,
                            maxBytes: Int, bins: Int, binCol: String)
                           (binOf: Int => Int): DataFrame = {
    require(maxBytes > 0, s"byteHistogram: maxBytes must be positive, got $maxBytes")
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField(binCol, LongType, nullable = false),
      StructField("n", LongType, nullable = false)))
    val projected = df.select(col(idCol).cast("long"), col(payloadCol))
    projected.mapPartitions { rows =>
      // per-partition codec setup happens here in a real deployment
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        val counts = new Array[Long](bins)
        val n = math.min(bytes.length, maxBytes)
        var i = 0
        while (i < n) { counts(binOf(bytes(i) & 0xff)) += 1; i += 1 }
        (0 until bins).iterator.filter(c => counts(c) > 0)
          .map(c => Row(id, c.toLong, counts(c)))
      }
    }(RowEncoder.encoderFor(outSchema)).toDF("id", binCol, "n")
  }

  def byteClassCounts(df: DataFrame, idCol: String, payloadCol: String,
                      maxBytes: Int): DataFrame =
    byteHistogram(df, idCol, payloadCol, maxBytes, 16, "cls")(_ >> 4)

  /** Byte-VALUE histogram per payload over the head `maxBytes` bytes —
    * [[byteClassCounts]] at full 256-value resolution, the sufficient
    * statistic for entropy/compressibility audits. Output: (id, v, n),
    * absent values omitted. */
  def byteValueCounts(df: DataFrame, idCol: String, payloadCol: String,
                      maxBytes: Int): DataFrame =
    byteHistogram(df, idCol, payloadCol, maxBytes, 256, "v")(identity)

  /** A REAL decoder behind the injection seam — proof the [[Decoder]]
    * contract works beyond [[StubDecoder]] without native codecs: a
    * pure-JVM RIFF/WAVE PCM-16 parser (chunk walk, little-endian
    * samples, word-aligned chunk skip). Features:
    * [n_samples, mean |amplitude|, max |amplitude|, zero crossings] —
    * the loudness/activity profile an audio curation pipeline keys on.
    * Exercised end-to-end through [[extractFeatures]] in
    * MultimodalDecoderSpec; a production image/audio codec plugs into
    * the same seam with the same bytes→float-vector shape. */
  val PcmWavDecoder: Decoder = { bytes =>
    def le16(i: Int): Int = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    def le32(i: Int): Int = le16(i) | (le16(i + 2) << 16)
    def tag(i: Int): String = new String(bytes, i, 4, "US-ASCII")
    require(bytes != null && bytes.length >= 44 && tag(0) == "RIFF" &&
      tag(8) == "WAVE", "PcmWavDecoder: not a RIFF/WAVE payload")
    var off = 12
    var fmtOk = false
    var dataOff = -1
    var dataLen = 0
    while (off + 8 <= bytes.length) {
      val id = tag(off)
      val sz = le32(off + 4)
      if (id == "fmt ") {
        require(le16(off + 8) == 1, "PcmWavDecoder: not uncompressed PCM")
        require(le16(off + 22) == 16, "PcmWavDecoder: not 16-bit samples")
        fmtOk = true
      } else if (id == "data") { dataOff = off + 8; dataLen = sz }
      off += 8 + sz + (sz & 1) // RIFF chunks are 2-byte aligned
    }
    require(fmtOk && dataOff >= 0, "PcmWavDecoder: missing fmt /data chunk")
    val n = math.min(dataLen, bytes.length - dataOff) / 2
    var sumAbs = 0L
    var maxAbs = 0L
    var zc = 0L
    var prev = 0
    var i = 0
    while (i < n) {
      val s = (le16(dataOff + 2 * i) << 16) >> 16 // sign-extend 16→32
      val a = math.abs(s).toLong
      sumAbs += a
      if (a > maxAbs) maxAbs = a
      if (i > 0 && (s ^ prev) < 0) zc += 1
      prev = s
      i += 1
    }
    Array(n.toFloat, if (n == 0) 0f else (sumAbs.toDouble / n).toFloat,
      maxAbs.toFloat, zc.toFloat)
  }
}
