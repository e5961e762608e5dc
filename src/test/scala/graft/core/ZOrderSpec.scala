package graft.core

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}
import java.nio.file.Files

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton interleave: bit b of coord i -> output bit b*k+i. */
  private def refZ(coords: Seq[Long], bits: Int): Long = {
    var z = 0L
    for (b <- 0 until bits; (c, i) <- coords.zipWithIndex)
      z |= ((c >>> b) & 1L) << (b * coords.size + i)
    z
  }

  test("zOrderValue matches the reference interleave, 2 and 3 dims") {
    val pts = for (i <- 0L until 200L)
      yield (i * 2654435761L % (1L << 21), i * 40503L % (1L << 21),
        i * 9973L % (1L << 10))
    val got2 = pts.toDF("x", "y", "w")
      .select(F.col("x"), F.col("y"),
        Ops.zOrderValue(Seq(F.col("x"), F.col("y")), 21).as("z"))
      .as[(Long, Long, Long)].collect()
    got2.foreach { case (x, y, z) => assert(z == refZ(Seq(x, y), 21)) }
    val got3 = pts.toDF("x", "y", "w")
      .select(F.col("w"), F.col("x"), F.col("y"),
        Ops.zOrderValue(Seq(F.col("w"), F.col("x") % 1024, F.col("y") % 1024), 10)
          .as("z"))
      .as[(Long, Long, Long, Long)].collect()
    got3.foreach { case (w, x, y, z) =>
      assert(z == refZ(Seq(w, x % 1024, y % 1024), 10))
    }
  }

  test("z-curve quadrant invariant: truncating the key truncates every dim") {
    // dropping the low 2(bits-q) key bits must equal interleaving the
    // coords' own top q bits — the property that makes range partitions
    // on z multi-dimensional cells
    val bits = 16
    val pts = for (i <- 0L until 300L)
      yield (i * 48271L % (1L << bits), i * 16807L % (1L << bits))
    pts.foreach { case (x, y) =>
      val z = refZ(Seq(x, y), bits)
      for (q <- Seq(2, 5, 8))
        assert((z >>> (2 * (bits - q))) ==
          refZ(Seq(x >>> (bits - q), y >>> (bits - q)), q))
    }
    // and the Spark expression agrees on the truncated form
    val q = 5
    val agree = pts.toDF("x", "y").select(
      (F.shiftrightunsigned(Ops.zOrderValue(Seq(F.col("x"), F.col("y")), bits),
        2 * (bits - q)) ===
        Ops.zOrderValue(Seq(F.shiftrightunsigned(F.col("x"), bits - q),
          F.shiftrightunsigned(F.col("y"), bits - q)), q)).as("ok"))
      .as[Boolean].collect()
    assert(agree.forall(identity))
  }

  test("zOrderKey min-max scaling: mins -> 0, maxes -> full mask, exact div") {
    val df = Seq((10L, -5L), (110L, 15L), (60L, 5L)).toDF("a", "b")
    val got = Ops.zOrderKey(df, Seq("a", "b"), bits = 4)
      .select("a", "b", "zvalue").as[(Long, Long, Long)].collect().toMap2
    def scale(v: Long, lo: Long, hi: Long) = (v - lo) * 15L / (hi - lo)
    got.foreach { case ((a, b), z) =>
      assert(z == refZ(Seq(scale(a, 10, 110), scale(b, -5, 15)), 4))
    }
  }

  test("zOrderKey handles constant columns and rejects empty/colliding input") {
    val df = Seq((1L, 7L), (2L, 7L)).toDF("a", "b")
    val z = Ops.zOrderKey(df, Seq("a", "b"), bits = 4)
      .select("zvalue").as[Long].collect().toSet
    assert(z == Set(refZ(Seq(0L, 0L), 4), refZ(Seq(15L, 0L), 4)))
    intercept[IllegalArgumentException](
      Ops.zOrderKey(df.filter(F.lit(false)), Seq("a"), 4))
    intercept[IllegalArgumentException](
      Ops.zOrderKey(df.withColumn("zvalue", F.lit(1L)), Seq("a"), 4))
  }

  test("writeZOrdered round-trips rows; files cover disjoint Morton ranges") {
    val dir = Files.createTempDirectory("zorder").toString
    val pts = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val df = pts.toDF("x", "y").repartition(8)
    val nFiles = Ops.writeZOrdered(df, s"$dir/t", Seq("x", "y"), bits = 6,
      targetFileBytes = 8L << 10, fallbackBytesPerRow = 64L)
    val back = spark.read.parquet(s"$dir/t")
    assert(back.columns.sorted.toSeq == Seq("x", "y")) // key dropped
    assert(back.as[(Long, Long)].collect().sorted.toSeq == pts.sorted)
    if (nFiles > 1) {
      // per-file Morton interval: zone-map-disjoint by construction
      val spans = back
        .withColumn("_f", F.input_file_name())
        .withColumn("_z", Ops.zOrderValue(
          Seq(F.col("x"), F.col("y")), 6)) // ids already span [0, 2^6)
        .groupBy("_f").agg(F.min("_z").as("lo"), F.max("_z").as("hi"))
        .as[(String, Long, Long)].collect().map(t => (t._2, t._3)).sortBy(_._1)
      spans.sliding(2).foreach {
        case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2,
          s"overlapping file z-ranges: $hi1 > $lo2")
        case _ =>
      }
    }
  }

  private implicit class MapPairs(rows: Array[(Long, Long, Long)]) {
    def toMap2: Map[(Long, Long), Long] =
      rows.map(t => (t._1, t._2) -> t._3).toMap
  }
}
