package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, functions => F}
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Assets are opaque `binary` columns plus a typed metadata struct — the
  * schema, partitioning, and batch shape are real and tested; the actual
  * codec call is STUBBED (this container has no image/audio libraries)
  * behind `decodeStub`, a deterministic fake that derives plausible
  * metadata from the bytes. Swap `decodeStub` for a real decoder bound in
  * `mapPartitions` (per-partition codec init, streaming batches — the JVM
  * analogue of the reference's pandas_udf/mapInPandas pattern,
  * ann/index_inferers/hnswlib_index_inferer.py:17-46).
  */
object Multimodal {
  /** Canonical asset schema: id + bytes + declared format. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("format", StringType, nullable = true),
  ))

  /** Metadata produced by decode: dimensions/duration + integrity hash. */
  val metaSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("checksum", StringType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
  ))

  /** Wrap any table into fake binary assets (deterministic: bytes = UTF-8
    * of a text column). */
  def fakeAssets(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(F.col(idCol).cast("long").as("asset_id"),
      F.encode(F.col(textCol), "UTF-8").as("content"),
      F.lit("fake/img").as("format"))

  /** STUB decode — deterministic metadata from bytes:
    * width = 64 + len mod 512, height = 64 + (len*7) mod 512. A real
    * decoder replaces exactly this expression block (or a mapPartitions
    * body); everything downstream (schema, grouping, joins) is unchanged. */
  def decodeStub(assets: DataFrame): DataFrame =
    assets.select(
      F.col("asset_id"),
      F.length(F.col("content")).cast("long").as("byte_len"),
      F.md5(F.col("content")).as("checksum"),
      (F.lit(64L) + F.pmod(F.length(F.col("content")).cast("long"), F.lit(512L))).as("width"),
      (F.lit(64L) + F.pmod(F.length(F.col("content")).cast("long") * 7, F.lit(512L))).as("height"),
    )

  /** mapPartitions-shaped decode: identical output to `decodeStub` but
    * routed through a per-partition "codec" — demonstrating the real
    * integration shape (codec initialized once per partition, rows
    * streamed through it) without a codec library in the container. */
  def decodePartitioned(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val rdd = assets.select("asset_id", "content").rdd.mapPartitions { rows =>
      // real impl: val codec = Codec.open() here, close on exhaustion
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val len = bytes.length.toLong
        val md = java.security.MessageDigest.getInstance("MD5")
        val checksum = md.digest(bytes).map("%02x".format(_)).mkString
        Row(id, len, checksum, 64L + len % 512L, 64L + (len * 7) % 512L)
      }
    }
    spark.createDataFrame(rdd, metaSchema)
  }

  /** Resize planning: fit (width, height) into a bounding box preserving
    * aspect ratio — the Spark-side arithmetic of a resize stage (the pixel
    * work itself belongs in the decodePartitioned codec body). Integer
    * scaling: out_w = min(maxW, w·maxH div h bounded), pure expressions. */
  def resizeDims(meta: DataFrame, maxW: Long, maxH: Long): DataFrame = {
    val w = F.col("width"); val h = F.col("height")
    // pick the binding side by cross-multiplication (exact long compare),
    // scale the other side with floor division — long products stay well
    // under 2^53, so the double quotient floors exactly
    val fitByWidth = (h * F.lit(maxW)) <= (w * F.lit(maxH)) // maxW/w <= maxH/h
    meta.select(F.col("asset_id"), w.as("width"), h.as("height"),
      F.when(fitByWidth, F.lit(maxW))
        .otherwise(F.floor((w * F.lit(maxH)) / h)).cast("long").as("out_w"),
      F.when(fitByWidth, F.floor((h * F.lit(maxW)) / w))
        .otherwise(F.lit(maxH)).cast("long").as("out_h"))
  }

  /** Feature extraction: 16-bin byte histogram per asset, L1-normalized —
    * a real (non-stub) content feature with the same per-partition
    * mapPartitions shape a learned-embedding extractor would use. */
  def byteHistogram(assets: DataFrame, bins: Int = 16): DataFrame = {
    val spark = assets.sparkSession
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))
    val b = bins
    val rdd = assets.select("asset_id", "content").rdd.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val hist = new Array[Double](b)
        bytes.foreach { x => hist(((x & 0xff) * b) / 256) += 1.0 }
        val n = math.max(bytes.length, 1).toDouble
        Row(r.getLong(0), hist.map(_ / n).toSeq)
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** "Frame sampling": slice every `stride`-th fixed-size block out of a
    * binary payload (the shape of video frame extraction — block offsets
    * computed as expressions, bytes sliced distributedly). */
  def sampleBlocks(assets: DataFrame, blockSize: Int, stride: Int): DataFrame =
    assets.select(F.col("asset_id"),
      F.posexplode(
        F.transform(
          F.sequence(F.lit(0),
            F.greatest(((F.length(F.col("content")) - blockSize) /
              (blockSize * stride)).cast("int"), F.lit(0))),
          i => F.substring(F.col("content"),
            (i * blockSize * stride + 1).cast("int"), F.lit(blockSize)))))
      .withColumnRenamed("pos", "block_idx")
      .withColumnRenamed("col", "block")
      .withColumn("block_len", F.length(F.col("block")).cast("long"))
}
