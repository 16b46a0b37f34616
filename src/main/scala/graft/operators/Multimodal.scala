package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with a
  * typed metadata struct, plus the decode/feature-extract scaffolding a
  * training-data pipeline needs.
  *
  * Four media formats have REAL codecs here: uncompressed raw images
  * (GRAW — header+samples byte math in codegen'd builtins), PCM16
  * audio (WAV — canonical RIFF blobs, little-endian signed byte math),
  * DEFLATE-compressed PNG, and lossy JPEG (both through the JDK's own
  * ImageIO codec — no external library). The lossless three are gated
  * against formula-only oracles a wrong round-trip cannot match; lossy
  * JPEG can never sit under a formula oracle (implementation-defined
  * decode error) and is spec-pinned instead (bounded error, real
  * compression, loud failure). Only codecs genuinely needing external
  * native libraries (video containers, modern lossy audio) keep the
  * clearly-marked deterministic stand-in ([[stubDecodeFeatures]]);
  * everything around it — schema, batch shape, partition-parallel
  * execution — is real and tested, and a cluster deployment swaps only
  * the stub body (e.g. a JNI decoder or `mapInPandas` + PIL on the
  * Python side).
  */
object Multimodal {

  /** Pack a payload column into (id, media: binary, meta: struct).
    * `meta` carries the typed fields a scan can prune to without
    * touching the blob — at 100 TB, metadata-only queries must never
    * read the binary column (columnar Parquet gives exactly that). */
  def pack(df: DataFrame, idCol: String, payloadCol: String, kind: String): DataFrame =
    df.select(
      col(idCol).as("id"),
      encode(col(payloadCol), "UTF-8").as("media"),
      struct(
        lit(kind).as("kind"),
        octet_length(encode(col(payloadCol), "UTF-8")).as("n_bytes"),
        substring(col(payloadCol), 1, 8).as("head")).as("meta"))

  /** STUB decode: a real implementation would decode the media blob
    * (image/audio/video) and emit features. This deterministic fake
    * derives a fixed-length "feature vector" from the bytes so the
    * pipeline shape (binary in → fixed-width array out, partition-
    * parallel, no driver involvement) is exercised end-to-end. */
  def stubDecodeFeatures(packed: DataFrame, dim: Int = 4): DataFrame =
    packed.select(col("id"), col("meta.n_bytes").as("n_bytes"),
      transform(sequence(lit(0), lit(dim - 1)),
        d => (crc32(col("media")) % (d * 97 + 101)).cast("double")).as("features"))

  /** The stub decoder as a plain JVM function over the raw bytes —
    * byte-for-byte the same arithmetic as [[stubDecodeFeatures]]'s
    * columnar expression (CRC32 of the blob, folded per dimension), so
    * the two decode paths are mutually checkable. */
  def stubBytesToFeatures(dim: Int)(media: Array[Byte]): Array[Double] = {
    val crc = new java.util.zip.CRC32()
    crc.update(media)
    val v = crc.getValue
    Array.tabulate(dim)(d => (v % (d * 97 + 101)).toDouble)
  }

  /** Partition-batched decode harness — the JVM analog of the
    * `mapInPandas` batch shape: the decoder function sees one partition
    * as an ITERATOR of (id, blob) rows and yields feature rows, so a
    * real implementation initializes its codec context (JNI handles,
    * model weights, thread pools) ONCE per partition and streams blobs
    * through it — never one init per row, never anything at the driver.
    * Output schema matches [[stubDecodeFeatures]]; the default decoder
    * is the deterministic stub (equivalence is spec-enforced), and a
    * cluster deployment swaps only `decode`. */
  def decodePartitioned(packed: DataFrame, dim: Int = 4,
      decode: Array[Byte] => Array[Double] = null): Dataset[(Long, Long, Array[Double])] = {
    val spark = packed.sparkSession
    import spark.implicits._
    val fn = Option(decode).getOrElse(stubBytesToFeatures(dim) _)
    packed.select(col("id").cast("long"), col("media"),
        col("meta.n_bytes").cast("long"))
      .as[(Long, Array[Byte], Long)]
      .mapPartitions { rows =>
        // per-partition decoder/codec init belongs HERE (runs once per
        // task); the stub needs none
        rows.map { case (id, media, n) => (id, n, fn(media)) }
      }
  }

  /** Frame/sample selector shape: take every `stride`-th byte of the
    * blob as a "sample" (stand-in for video frame-sampling; shows the
    * slice-without-full-decode pattern). */
  def sampleBytes(packed: DataFrame, stride: Int, maxSamples: Int): DataFrame =
    packed.select(col("id"),
      transform(
        sequence(lit(1), least(lit(maxSamples),
          greatest((col("meta.n_bytes") / stride).cast("int"), lit(1)))),
        i => getbit(col("media"), (i * stride).cast("long") % (col("meta.n_bytes") * 8)))
        .as("samples"))

  // ---- GRAW: a REAL decodable raw-media format ---------------------------
  //
  // The env has no codec libraries, but "no libjpeg" does not excuse a
  // fake decoder for UNCOMPRESSED media: GRAW is a trivial raw format
  // (the PPM/WAV-class shape) this module encodes AND decodes with
  // real byte arithmetic — magic "GRW1" (4 bytes), width (2 bytes BE),
  // height (2 bytes BE), channels (1 byte), then w*h*c interleaved
  // row-major samples, one byte each. Both directions run as
  // codegen'd builtins (substring/hex/conv over BinaryType), never a
  // UDF: byte i is conv(hex(substring(media, i+1, 1)), 16, 10) and a
  // byte is emitted as unhex(two hex chars). A wrong header layout,
  // endianness, or off-by-one CANNOT cancel out between the paths —
  // q_multimodal_decode's oracle recomputes the expected statistics
  // from the pixel FORMULA alone (pure integer SQL in DuckDB, no
  // bytes), so only a correct byte round-trip matches it.

  /** byte `i` (0-based) of a binary column, as an int in 0..255. */
  private def byteAt(bin: Column, i: Column): Column =
    conv(hex(substring(bin, (i + 1).cast("int"), lit(1))), 16, 10)
      .cast("int")

  /** int 0..255 → one binary byte. */
  private def asByte(v: Column): Column = unhex(lpad(hex(v), 2, "0"))

  /** int 0..65535 → two big-endian binary bytes. */
  private def asBe16(v: Column): Column = unhex(lpad(hex(v), 4, "0"))

  /** Encode (id, pixels: array<int>) rows as GRAW blobs. `pixels` is
    * interleaved row-major w*h*c samples in 0..255; an out-of-range
    * sample fails LOUDLY at encode time (lpad would silently TRUNCATE
    * a 3-hex-char value to its top byte — 300 would pack as 18 with a
    * length-consistent blob, the exact silent-statistics-skew the
    * format exists to prevent). */
  def packRaw(df: DataFrame, idCol: String, pixelsCol: String,
      width: Int, height: Int, channels: Int): DataFrame = {
    require(width > 0 && width <= 0xffff && height > 0 && height <= 0xffff &&
      channels > 0 && channels <= 255, s"graw: bad dims ${width}x${height}x$channels")
    val header = concat(
      encode(lit("GRW1"), "UTF-8"),
      asBe16(lit(width)), asBe16(lit(height)), asByte(lit(channels)))
    val body = array_join(transform(col(pixelsCol),
      p => when(p.between(0, 255), lpad(hex(p), 2, "0"))
        .otherwise(raise_error(concat(lit("graw: sample out of byte "),
          lit("range: "), p.cast("string"))))), "")
    df.select(
      col(idCol).as("id"),
      concat(header, unhex(body)).as("media"),
      struct(lit("graw").as("kind"),
        lit(4 + 2 + 2 + 1 + width * height * channels).as("n_bytes"),
        lit(width).as("width"), lit(height).as("height"),
        lit(channels).as("channels")).as("meta"))
  }

  /** Decode GRAW blobs — header parse + per-channel mean over the
    * sample bytes, all real byte math in codegen'd builtins. Fails
    * loudly (not silently-null) on a bad magic or a length that
    * disagrees with the header: corrupt media must surface at the
    * decode, not as skewed statistics downstream. */
  def rawStats(packed: DataFrame): DataFrame = {
    val media = col("media")
    val ok = substring(media, 1, 4) === encode(lit("GRW1"), "UTF-8")
    val w = (byteAt(media, lit(4)) * 256 + byteAt(media, lit(5))).as("width")
    val h = (byteAt(media, lit(6)) * 256 + byteAt(media, lit(7))).as("height")
    val c = byteAt(media, lit(8)).as("channels")
    val parsed = packed.select(col("id"), media,
      when(ok, w).otherwise(raise_error(concat(lit("graw: bad magic in id="),
        col("id").cast("string")))).as("width"), h, c)
      .withColumn("_n", col("width") * col("height") * col("channels"))
      .withColumn("_len_ok",
        when(octet_length(media) === col("_n") + 9, lit(true))
          .otherwise(raise_error(concat(
            lit("graw: length/header mismatch in id="),
            col("id").cast("string")))))
    parsed.select(col("id"), col("width"), col("height"), col("channels"),
      transform(sequence(lit(0), col("channels") - 1), ch =>
        aggregate(
          sequence(lit(0L), (col("width") * col("height")).cast("long") - 1),
          lit(0L),
          (acc, px) => acc + byteAt(media,
            lit(9) + px * col("channels") + ch).cast("long"),
          s => s.cast("double") / (col("width") * col("height"))))
        .as("channel_means"))
  }

  /** The same decode as a plain JVM function — the per-partition codec
    * body for [[decodePartitioned]]-style harnesses; spec-enforced
    * byte-identical to [[rawStats]]. Returns (width, height, channels,
    * per-channel means). */
  def rawBytesToStats(media: Array[Byte]): (Int, Int, Int, Array[Double]) = {
    require(media.length >= 9 && media(0) == 'G' && media(1) == 'R' &&
      media(2) == 'W' && media(3) == '1', "graw: bad magic")
    def u(i: Int) = media(i) & 0xff
    val w = u(4) * 256 + u(5); val h = u(6) * 256 + u(7); val c = u(8)
    require(media.length == 9 + w * h * c, "graw: length/header mismatch")
    val sums = new Array[Long](c)
    var i = 0
    while (i < w * h * c) { sums(i % c) += u(9 + i); i += 1 }
    (w, h, c, sums.map(_.toDouble / (w * h)))
  }

  // ---- WAV: the AUDIO modality on a real-world format ---------------------
  //
  // Canonical 44-byte RIFF/WAVE PCM header + interleaved signed 16-bit
  // little-endian samples — the GRAW discipline (codegen'd byte math,
  // no UDF, loud failure) on the format audio pipelines actually ship.
  // Little-endian 16-bit SIGNED samples are the part a wrong
  // implementation gets silently wrong (sign fold-back, byte order);
  // the gate's oracle recomputes channel means from the sample FORMULA,
  // so neither mistake can cancel between pack and decode.

  /** int 0..2^32−1 → four little-endian bytes (shift+mask, never `/`:
    * Spark's `/` is DOUBLE division, and lpad(hex(x), 2) would
    * silently truncate an unmasked value). */
  private def asLe32(v: Column): Column = {
    val x = v.cast("long")
    concat(asByte(x.bitwiseAND(lit(255L))),
      asByte(shiftright(x, 8).bitwiseAND(lit(255L))),
      asByte(shiftright(x, 16).bitwiseAND(lit(255L))),
      asByte(shiftright(x, 24).bitwiseAND(lit(255L))))
  }

  /** int 0..65535 → two little-endian bytes. */
  private def asLe16(v: Column): Column = {
    val x = v.cast("long")
    concat(asByte(x.bitwiseAND(lit(255L))),
      asByte(shiftright(x, 8).bitwiseAND(lit(255L))))
  }

  /** little-endian unsigned 16-bit at byte offset `i` (0-based). */
  private def leU16(bin: Column, i: Column): Column =
    byteAt(bin, i) + byteAt(bin, i + 1) * 256

  /** Encode (id, samples: array<int>) rows as PCM16 WAV blobs.
    * `samples` is interleaved signed 16-bit (−32768..32767), `channels`
    * per frame; out-of-range samples fail LOUDLY at encode time. */
  def packWav(df: DataFrame, idCol: String, samplesCol: String,
      channels: Int, sampleRate: Int): DataFrame = {
    require(channels > 0 && channels <= 8 && sampleRate > 0,
      s"wav: bad shape ${channels}ch @$sampleRate")
    val n = size(col(samplesCol))
    val dataBytes = n * 2
    val header = concat(
      encode(lit("RIFF"), "UTF-8"), asLe32(lit(36) + dataBytes),
      encode(lit("WAVE"), "UTF-8"),
      encode(lit("fmt "), "UTF-8"), asLe32(lit(16)),
      asLe16(lit(1)), // PCM
      asLe16(lit(channels)), asLe32(lit(sampleRate)),
      asLe32(lit(sampleRate * channels * 2)), // byte rate
      asLe16(lit(channels * 2)), asLe16(lit(16)), // block align, bits
      encode(lit("data"), "UTF-8"), asLe32(dataBytes))
    // signed → unsigned fold (pmod), then two LE hex chars per byte
    val body = array_join(transform(col(samplesCol),
      s => when(s.between(-32768, 32767), {
        val u = pmod(s.cast("long"), lit(65536L))
        concat(lpad(hex(u.bitwiseAND(lit(255L))), 2, "0"),
          lpad(hex(shiftright(u, 8)), 2, "0"))
      }).otherwise(raise_error(concat(
        lit("wav: sample out of PCM16 range: "), s.cast("string"))))), "")
    df.select(
      col(idCol).as("id"),
      concat(header, unhex(body)).as("media"),
      struct(lit("wav").as("kind"), (lit(44) + dataBytes).as("n_bytes"),
        lit(channels).as("channels"), lit(sampleRate).as("sample_rate"),
        (n / channels).as("n_frames")).as("meta"))
  }

  /** Decode PCM16 WAV blobs — header parse + per-channel sample means,
    * all codegen'd byte math. Fails loudly on a bad magic, a
    * non-PCM16 format, or a data length that disagrees with the
    * header. */
  def wavStats(packed: DataFrame): DataFrame = {
    val media = col("media")
    val magicOk = substring(media, 1, 4) === encode(lit("RIFF"), "UTF-8") &&
      substring(media, 9, 4) === encode(lit("WAVE"), "UTF-8") &&
      substring(media, 37, 4) === encode(lit("data"), "UTF-8")
    val fmtOk = leU16(media, lit(20)) === 1 && leU16(media, lit(34)) === 16
    val parsed = packed.select(col("id"), media,
      // a 0-channel header can never come from packWav (its require
      // pins channels >= 1) — fail loudly on the corrupt blob instead
      // of dividing by zero into garbage means (round-14 ADVICE)
      when(magicOk && leU16(media, lit(22)) >= 1, leU16(media, lit(22)))
        .otherwise(raise_error(concat(lit("wav: bad header in id="),
          col("id").cast("string")))).as("channels"),
      when(fmtOk,
        leU16(media, lit(24)) + leU16(media, lit(26)) * lit(65536L))
        .otherwise(raise_error(concat(lit("wav: not PCM16 in id="),
          col("id").cast("string")))).as("sample_rate"),
      (leU16(media, lit(40)) + leU16(media, lit(42)) * lit(65536L))
        .as("_data_bytes"))
      .withColumn("_len_ok",
        when(octet_length(media) === col("_data_bytes") + 44, lit(true))
          .otherwise(raise_error(concat(
            lit("wav: length/header mismatch in id="),
            col("id").cast("string")))))
      .withColumn("n_frames",
        (col("_data_bytes") / 2 / col("channels")).cast("long"))
    // sample k (0-based over the interleave): LE u16 at 44 + 2k,
    // folded back to signed
    def sampleAt(k: Column): Column = {
      val u = leU16(media, lit(44) + k * 2)
      when(u < 32768, u).otherwise(u - 65536)
    }
    parsed.select(col("id"), col("channels"), col("sample_rate"),
      col("n_frames"),
      // packWav accepts an empty samples array, so a zero-frame WAV is
      // a VALID degenerate file: its means are the empty array. The
      // guard also keeps sequence(0, n_frames-1) from evaluating as the
      // descending [0,-1] (negative-offset header reads + 0-division —
      // round-14 ADVICE); CaseWhen only evaluates the taken branch.
      when(col("n_frames") === 0, array().cast("array<double>"))
        .otherwise(transform(sequence(lit(0), col("channels") - 1), ch =>
          aggregate(
            sequence(lit(0L), col("n_frames") - 1),
            lit(0L),
            (acc, f) => acc + sampleAt(f * col("channels") + ch).cast("long"),
            s => s.cast("double") / col("n_frames"))))
        .as("channel_means"))
  }

  /** The same decode as a plain JVM function ([[rawBytesToStats]]'s
    * contract on WAV): (channels, sampleRate, nFrames, means). */
  def wavBytesToStats(media: Array[Byte]): (Int, Int, Long, Array[Double]) = {
    def u8(i: Int) = media(i) & 0xff
    def u16(i: Int) = u8(i) + u8(i + 1) * 256
    require(media.length >= 44 &&
      new String(media, 0, 4, "UTF-8") == "RIFF" &&
      new String(media, 8, 4, "UTF-8") == "WAVE" &&
      new String(media, 36, 4, "UTF-8") == "data", "wav: bad header")
    require(u16(20) == 1 && u16(34) == 16, "wav: not PCM16")
    val c = u16(22)
    require(c >= 1, "wav: bad header (zero channels)")
    val rate = u16(24) + u16(26) * 65536
    val dataBytes = u16(40) + u16(42) * 65536
    require(media.length == 44 + dataBytes, "wav: length/header mismatch")
    val frames = dataBytes / 2 / c
    if (frames == 0) return (c, rate, 0L, Array.empty[Double])
    val sums = new Array[Long](c)
    var k = 0
    while (k < frames.toLong * c) {
      val u = u16(44 + 2 * k)
      sums(k % c) += (if (u < 32768) u else u - 65536)
      k += 1
    }
    (c, rate, frames.toLong, sums.map(_.toDouble / frames))
  }

  // ---- PNG: a REAL COMPRESSED codec (pure-JDK ImageIO) -------------------
  //
  // The environment's "no codec libraries" constraint is about NATIVE
  // libs (libjpeg etc.); the JDK itself ships a pure-Java PNG codec
  // (java.desktop's ImageIO), so the COMPRESSED-media class gets a real
  // encoder+decoder after all: DEFLATE-compressed filtered scanlines in,
  // pixels out. PNG being LOSSLESS is what makes it driver-oracle-able —
  // decoded samples equal the inputs exactly, so the gate's oracle
  // recomputes the expected statistics from the pixel FORMULA alone and
  // only a correct compress→decompress round-trip can match it (the
  // GRAW contract, now with an actual entropy coder in the loop). Both
  // directions run in the [[decodePartitioned]] batch shape: a
  // partition-iterator of rows through a plain JVM function, nothing at
  // the driver. Lossy codecs (JPEG) stay out of the ORACLE surface by
  // construction — their decode differs from the inputs by
  // implementation-defined error, so they can never hash-match a
  // formula — but the plumbing here is codec-agnostic.

  /** Encode interleaved row-major w*h*3 RGB samples (0..255) as a PNG
    * blob. Out-of-range samples fail LOUDLY (a silent & 0xff would skew
    * statistics downstream — the packRaw rule). */
  def pngEncode(pixels: Array[Int], width: Int, height: Int): Array[Byte] = {
    require(pixels.length == width * height * 3,
      s"png: ${pixels.length} samples for ${width}x${height}x3")
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var p = 0
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val r = pixels(p); val g = pixels(p + 1); val b = pixels(p + 2)
        require(((r | g | b) & ~0xff) == 0,
          s"png: sample out of byte range at ($x,$y): $r,$g,$b")
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        p += 3; x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "png", bos),
      "png: no JDK PNG writer available")
    bos.toByteArray
  }

  /** ImageIO decode (format sniffed from the bytes) → interleaved
    * row-major RGB samples. Fails loudly on an undecodable blob. */
  private def decodeImage(media: Array[Byte],
      what: String): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(media))
    require(img != null, s"$what: undecodable blob")
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Int](w * h * 3)
    var p = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        out(p) = (rgb >> 16) & 0xff
        out(p + 1) = (rgb >> 8) & 0xff
        out(p + 2) = rgb & 0xff
        p += 3; x += 1
      }
      y += 1
    }
    (w, h, out)
  }

  /** Decode a PNG blob back to interleaved row-major RGB samples —
    * the full inverse of [[pngEncode]] (lossless round-trip is
    * spec-pinned sample-exact). */
  def pngDecode(media: Array[Byte]): (Int, Int, Array[Int]) =
    decodeImage(media, "png")

  /** LOSSY JPEG through the same JDK codec — the media class that can
    * NEVER sit under a formula oracle (the decode differs from the
    * inputs by implementation-defined error, so it cannot hash-match
    * anything recomputed), which is why it is SPEC-pinned instead:
    * dims exact, per-sample round-trip error bounded, compression
    * real, failure loud. Deployments that need it get the same
    * partition-batch plumbing as PNG; the driver-oracle surface keeps
    * lossless formats only, by construction. */
  def jpegEncode(pixels: Array[Int], width: Int, height: Int): Array[Byte] = {
    require(pixels.length == width * height * 3,
      s"jpeg: ${pixels.length} samples for ${width}x${height}x3")
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var p = 0
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val r = pixels(p); val g = pixels(p + 1); val b = pixels(p + 2)
        require(((r | g | b) & ~0xff) == 0,
          s"jpeg: sample out of byte range at ($x,$y): $r,$g,$b")
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        p += 3; x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "jpg", bos),
      "jpeg: no JDK JPEG writer available")
    bos.toByteArray
  }

  /** Decode a JPEG blob to interleaved row-major RGB samples. */
  def jpegDecode(media: Array[Byte]): (Int, Int, Array[Int]) =
    decodeImage(media, "jpeg")

  /** Pack (id, pixels: array<int>) rows as PNG blobs with the typed
    * meta struct — [[packRaw]]'s contract on the compressed codec.
    * Runs partition-parallel through the [[decodePartitioned]] batch
    * shape (ImageIO is stateless, so there is no per-partition codec
    * context to initialize). */
  def packPng(df: DataFrame, idCol: String, pixelsCol: String,
      width: Int, height: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(pixelsCol).cast("array<int>"))
      .as[(Long, Array[Int])]
      .mapPartitions(_.map { case (id, px) =>
        (id, pngEncode(px, width, height)) })
      .toDF("id", "media")
      .select(col("id"), col("media"),
        struct(lit("png").as("kind"),
          octet_length(col("media")).as("n_bytes"),
          lit(width).as("width"), lit(height).as("height"),
          lit(3).as("channels")).as("meta"))
  }

  /** Decode PNG blobs to header dims + per-channel means — the
    * [[rawStats]] output contract through the real compressed codec.
    * The mean arithmetic matches rawStats exactly (integer sample sums
    * over w*h, divided once), so the two formats share one oracle. */
  def pngStats(packed: DataFrame): DataFrame = {
    val spark = packed.sparkSession
    import spark.implicits._
    packed.select(col("id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, media) =>
        val (w, h, px) = pngDecode(media)
        val sums = new Array[Long](3)
        var i = 0
        while (i < px.length) { sums(i % 3) += px(i); i += 1 }
        (id, w, h, 3, sums.map(_.toDouble / (w * h)))
      })
      .toDF("id", "width", "height", "channels", "channel_means")
  }

  /** Frame extraction without a full decode — the video-frame-sampling
    * shape on a REAL format: row `r`'s samples are bytes
    * [9 + r*w*c, 9 + (r+1)*w*c), sliced straight out of the blob
    * (substring never touches other rows' bytes). Every `strideRows`-th
    * row, as (id, row, samples: array<int>). */
  def rawRowSample(packed: DataFrame, strideRows: Int): DataFrame = {
    val media = col("media")
    val w = byteAt(media, lit(4)) * 256 + byteAt(media, lit(5))
    val h = byteAt(media, lit(6)) * 256 + byteAt(media, lit(7))
    val c = byteAt(media, lit(8))
    packed.select(col("id"), w.as("_w"), h.as("_h"), c.as("_c"), media)
      .select(col("id"),
        explode(sequence(lit(0), col("_h") - 1, lit(strideRows))).as("row"),
        col("_w"), col("_c"), col("media"))
      .select(col("id"), col("row"),
        transform(sequence(lit(0), col("_w") * col("_c") - 1), j =>
          byteAt(col("media"), lit(9) + col("row") * col("_w") * col("_c") + j))
          .as("samples"))
  }
}
