package graft.core

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}

/** DotProduct must be a drop-in for the HOF fold it replaced: bitwise-equal
  * values (the DuckDB oracles hash the exact doubles) and identical null
  * semantics, in both codegen and interpreted evaluation. */
class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    F.aggregate(
      F.zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      F.lit(0.0), (acc, v) => acc + v)

  test("dot_product matches the HOF fold bitwise on random double arrays") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)(
      (Array.fill(17)(rnd.nextDouble() * 2 - 1), Array.fill(17)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
      .select(DotProduct(F.col("a"), F.col("b")).as("fast"),
        hofDot(F.col("a"), F.col("b")).as("slow"))
    assert(df.filter(F.col("fast") =!= F.col("slow")).count() == 0)
    // bitwise, not approx: the accumulation order must be identical
    val (f, s) = df.as[(Double, Double)].collect().head match { case t => t }
    assert(java.lang.Double.doubleToLongBits(f) == java.lang.Double.doubleToLongBits(s))
  }

  test("dot_product accepts float arrays (element-wise cast)") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(2.0, 0.5, 1.0)))
      .toDF("a", "b")
      .select(DotProduct(F.col("a"), F.col("b")).as("d"))
    assert(df.as[Double].head() == 1.0 * 2.0 + 2.0 * 0.5 + 3.0 * 1.0)
  }

  test("dot_product null semantics match zip_with padding") {
    val df = Seq(
      (Some(Seq(Some(1.0), Some(2.0))), Some(Seq(Some(3.0)))),          // unequal → null
      (Some(Seq(Some(1.0), None)), Some(Seq(Some(3.0), Some(4.0)))),    // null elem → null
      (None, Some(Seq(Some(1.0)))),                                     // null array → null
      (Some(Seq.empty[Option[Double]]), Some(Seq.empty[Option[Double]])), // empty → 0.0
      (Some(Seq(Some(2.0), Some(3.0))), Some(Seq(Some(4.0), Some(5.0)))), // plain → 23.0
    ).toDF("a", "b")
      .select(DotProduct(F.col("a"), F.col("b")).as("fast"),
        hofDot(F.col("a"), F.col("b")).as("slow"))
    val got = df.as[(Option[Double], Option[Double])].collect()
    assert(got.forall { case (f, s) => f == s })
    assert(got.map(_._1).toSeq == Seq(None, None, None, Some(0.0), Some(23.0)))
  }

  test("md5_prefix60 equals the hex conv chain bit-for-bit") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(500)(rnd.alphanumeric.take(1 + rnd.nextInt(40)).mkString) :+
      "" :+ "42:0:7" :+ "α:β"  // empty, delimiter-looking, multi-byte UTF-8
    val df = rows.toDF("s").select(
      Md5Prefix60(F.col("s")).as("fast"),
      F.conv(F.substring(F.md5(F.col("s")), 1, 15), 16, 10).cast("long").as("slow"))
    assert(df.filter(F.col("fast") =!= F.col("slow")).count() == 0)
    assert(df.filter(F.col("fast") < 0).count() == 0) // 60 bits, never negative
  }

  test("md5_prefix60 null passthrough and interpreted eval") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val got = Seq((Some("x"), 1), (None, 2)).toDF("s", "i")
      .select(Md5Prefix60(F.col("s")).as("h")).as[Option[Long]].collect()
    assert(got(1).isEmpty && got(0).nonEmpty)
    val e = Md5Prefix60(Literal.create(
      org.apache.spark.unsafe.types.UTF8String.fromString("x"),
      org.apache.spark.sql.types.StringType))
    assert(e.eval(null) == got(0).get) // interpreted == codegen
  }

  test("dot_product interpreted eval agrees with codegen") {
    // forcing the interpreted path: evaluate the expression directly
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val a = Literal.create(ArrayData.toArrayData(Array(1.5, -2.0, 0.25)), ArrayType(DoubleType))
    val b = Literal.create(ArrayData.toArrayData(Array(2.0, 1.0, 4.0)), ArrayType(DoubleType))
    assert(DotProduct(a, b).eval(null) == 1.5 * 2.0 + -2.0 * 1.0 + 0.25 * 4.0)
  }

  test("GraftExtensions exposes the native expressions to pure SQL") {
    GraftExtensions.register(spark)
    val dot = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .as[Double].first()
    assert(dot == 11.0)
    // SQL form == DSL form == the hex-string conv chain the oracles use
    val row = spark.sql(
      """SELECT md5_prefix60('42:7:z') AS h,
        |  CAST(conv(substring(md5('42:7:z'), 1, 15), 16, 10) AS BIGINT) AS ref
        |""".stripMargin).first()
    assert(row.getLong(0) == row.getLong(1))
    // float arrays coerce like the Column wrapper
    val f = spark.sql(
      "SELECT dot_product(array(CAST(1.5 AS FLOAT)), array(2.0D)) AS d")
      .as[Double].first()
    assert(f == 3.0)
    // arity errors fail at analysis, not at runtime
    intercept[Exception] { spark.sql("SELECT dot_product(array(1.0D))").collect() }
  }

  test("md5_pair60 equals the generic string-concat chain bit-for-bit") {
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(500)((rnd.nextLong(), rnd.nextLong())) ++ Seq(
      (0L, 0L), (-1L, 1L), (Long.MinValue, Long.MaxValue),
      (Long.MaxValue, Long.MinValue), (10L, -10L), (9999999999L, 1L))
    Seq(42L, 0L, -7L, Long.MinValue).foreach { seed =>
      val df = rows.toDF("q", "i").select(
        Md5Pair60(seed, F.col("q"), F.col("i")).as("fast"),
        Md5Prefix60(F.concat_ws(":", F.lit(seed.toString),
          F.col("q").cast("string"), F.col("i").cast("string"))).as("slow"))
      assert(df.filter(F.col("fast") =!= F.col("slow")).count() == 0,
        s"pair-hash drift at seed=$seed")
      assert(df.filter(F.col("fast") < 0).count() == 0)
    }
    // interpreted eval == codegen
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = Md5Pair60(42L, Literal(7L), Literal(-3L))
    val viaDf = Seq((7L, -3L)).toDF("q", "i")
      .select(Md5Pair60(42L, F.col("q"), F.col("i"))).as[Long].head()
    assert(e.eval(null) == viaDf)
  }
}
