package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with a
  * typed metadata struct, plus the decode/feature-extract scaffolding a
  * training-data pipeline needs.
  *
  * Real codec libraries are not available in this environment, so the
  * decode step is a clearly-marked deterministic stand-in
  * ([[stubDecodeFeatures]]); everything around it — schema, batch
  * shape, partition-parallel execution — is real and tested. On a
  * cluster the stub body is the only thing to swap for an actual
  * decoder (e.g. a JNI image library or `mapInPandas` + PIL on the
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
}
