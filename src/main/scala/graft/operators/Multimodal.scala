package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media (image/audio/video) as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted in partition-sized
  * batches.
  *
  * The container has no image/audio libraries, so [[decodeStub]] is a
  * clearly-marked deterministic fake (header fields + nibble histogram from
  * the raw bytes). Everything around it — binary column schema, the
  * `Dataset.mapPartitions` batch shape with product encoders, partitioning —
  * is the real pipeline a codec-backed decoder would drop into: swap
  * `decodeStub` for an actual decoder and nothing else changes.
  *
  * Scale shape (100 TB): decode is per-partition imperative work with no
  * shuffle; partition sizing (`spark.sql.files.maxPartitionBytes`) bounds
  * decoder memory. This is the one operator family where `mapPartitions`
  * beats expressions — codecs are black-box native calls, not Catalyst
  * expressions (SURVEY.md preference order (d)).
  */
object Multimodal {

  /** Decoded media metadata + a small feature vector. */
  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long, height: Long,
                       channels: Long, feat: Array[Long])

  /** STUB decoder — deterministic fake standing in for a real codec
    * (libs unavailable in this container). Header fields derive from the
    * first bytes; the "feature vector" is the low-nibble histogram.
    */
  def decodeStub(bytes: Array[Byte]): (Long, Long, Long, Array[Long]) = {
    val b0 = bytes(0) & 0xff
    val b1 = bytes(1) & 0xff
    val b2 = bytes(2) & 0xff
    val width = 32L + b0 % 224
    val height = 32L + b1 % 224
    val channels = 1L + b2 % 3
    val hist = new Array[Long](16)
    bytes.foreach(b => hist(b & 0x0f) += 1)
    (width, height, channels, hist)
  }

  /** Batch decode: (id, binary) rows through the stub decoder, one partition
    * at a time — the mapInPandas-equivalent batch shape in Scala.
    */
  def extractMeta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    implicit val inEnc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    implicit val outEnc = Encoders.product[MediaMeta]
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (w, h, c, feat) = decodeStub(bytes)
          MediaMeta(id, bytes.length.toLong, w, h, c, feat)
        }
      }
      .toDF()
  }

  /** DuckDB twin of [[extractMeta]] over bytes produced as `unhex(md5(text))`:
    * byte i (1-based) is hex pair (2i-1, 2i) of the md5, so every stub field
    * is recomputable from the hex string.
    */
  def duckMetaSql(table: String, idCol: String): String = {
    val b = (i: Int) => s"CAST('0x' || substr(h, ${2 * i - 1}, 2) AS UBIGINT)"
    s"""WITH hx AS (SELECT $idCol AS doc_id, md5(text) AS h FROM $table)
       SELECT doc_id,
              CAST(16 AS BIGINT) AS n_bytes,
              CAST(32 + ${b(1)} % 224 AS BIGINT) AS width,
              CAST(32 + ${b(2)} % 224 AS BIGINT) AS height,
              CAST(1 + ${b(3)} % 3 AS BIGINT) AS channels,
              array_to_string(list_transform(generate_series(0, 15), n ->
                CAST(len(list_filter(generate_series(1, 16), i ->
                  substr(h, 2*i, 1) = substr('0123456789abcdef', n + 1, 1))) AS BIGINT)), ',') AS feat
       FROM hx ORDER BY doc_id"""
  }
}
