package graft.text

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.types.{ByteType, DoubleType}

/** Embedding compression for vector corpora whose raw float storage is
  * itself the scale problem (a 10⁹-vector × 64-dim float32 table is
  * 256 GB before a single query runs; at 100 TB corpus scale the vector
  * table rivals the text it indexes).
  *
  * Two compressors, both pure-Catalyst on the encode/decode path:
  *
  * - **int8 scalar quantization** (`quantizeInt8`): per-vector symmetric
  *   max-abs scale, 4× smaller, sub-percent cosine error. Encode/decode
  *   are whole-stage-codegen HOFs (`transform`/`array_max`) with IEEE
  *   double arithmetic, so a DuckDB oracle reproduces every code exactly.
  * - **product quantization** (`PqIndex`): M subspaces × 2^b seeded
  *   KMeans codewords; a vector stores M byte codes (d·4/M× compression —
  *   32× at d=64, M=8). Search scores candidates by asymmetric distance
  *   (query stays full-precision, items stay compressed) and exact
  *   re-ranking restores top-k quality. The reference's ANN extension
  *   (hnswlib/nmslib, extensions/ann/index_builders) holds raw float
  *   vectors per executor; PQ is the standard answer when they no longer
  *   fit — engine-side widening, same `AnnIndex` plug as IVF/LSH/HNSW.
  */
object Quantize {
  /** Per-vector symmetric max-abs, in DOUBLE (floats are widened FIRST so
    * the oracle's double arithmetic matches bit-for-bit). */
  def maxAbs(vec: Column): Column =
    F.array_max(F.transform(vec, x => F.abs(x.cast(DoubleType))))

  /** int8 code per element: floor(x·127/maxabs + 0.5) — explicit
    * half-up-toward-+inf so Spark and any SQL oracle agree on .5
    * boundaries (both `round`s disagree cross-engine on ties). The zero
    * vector has no scale; it encodes as all-zero codes. Range is
    * [-127, 127], so TINYINT never wraps. */
  def int8Codes(vec: Column): Column = {
    val m = maxAbs(vec)
    F.when(m === 0d, F.transform(vec, _ => F.lit(0).cast(ByteType)))
      .otherwise(F.transform(vec, x =>
        F.floor(x.cast(DoubleType) * 127d / m + 0.5d).cast(ByteType)))
  }

  /** Dequantization factor: maxabs/127 (0 for the zero vector). */
  def int8Scale(vec: Column): Column = {
    val m = maxAbs(vec)
    F.when(m === 0d, F.lit(0d)).otherwise(m / 127d)
  }

  /** codes·scale → approximate double vector. */
  def dequantize(codes: Column, scale: Column): Column =
    F.transform(codes, c => c.cast(DoubleType) * scale)

  /** (id, codes: array<tinyint>, scale: double) — the compressed table a
    * 100 TB pipeline persists instead of the float vectors. */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(F.col(idCol), int8Codes(F.col(vecCol)).as("codes"),
      int8Scale(F.col(vecCol)).as("scale"))

  /** Exact per-label centroid statistics over the int8 CODES — the
    * embedding-space drift/separation audit that float averaging can't
    * give cross-engine (float sums are order-sensitive; int8 code sums
    * are BIGINT-exact): per (label, dim) the count, code sum and the
    * signed mean in ppm (`sign·(|Σ|·10⁶ div n)` — sign after dividing
    * non-negatives, the div-vs-floor rule). Two snapshots' outputs
    * joined on (label, dim) give centroid drift by subtraction; labels
    * with diverging centroids separate, collapsing ones don't. ONE
    * posexplode (d× rows) + a (labels·d)-sized groupBy. */
  def labelCentroids(df: DataFrame, labelCol: String,
      vecCol: String): DataFrame =
    df.select(F.col(labelCol).cast("long").as("label"),
        F.posexplode(int8Codes(F.col(vecCol))).as(Seq("dim", "code")))
      .groupBy(F.col("label"), F.col("dim").cast("long").as("dim"))
      .agg(F.count(F.lit(1)).as("n"),
        F.sum(F.col("code").cast("long")).as("sum_code"))
      .withColumn("mean_code_ppm", F.expr(
        """(CASE WHEN sum_code < 0 THEN -1L ELSE 1L END)
          |  * ((abs(sum_code) * 1000000) div n)""".stripMargin))

  /** Round-trip to doubles: quantize, then dequantize — the vector a
    * downstream consumer actually sees. */
  def requantized(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    quantizeInt8(df, idCol, vecCol)
      .select(F.col(idCol),
        dequantize(F.col("codes"), F.col("scale")).as(vecCol))
}
