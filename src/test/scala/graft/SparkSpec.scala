package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local session for specs; mirrors the reference's tiny-fixture
  * golden-value style (SURVEY §5). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  override def afterAll(): Unit = () // session shared across suites

  /** Order-insensitive DataFrame equality on collected rows. */
  def assertSameRows(actual: DataFrame, expected: Seq[Product]): Unit = {
    val got = actual.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val want = expected.map(_.productIterator.toSeq).sortBy(_.mkString("|"))
    assert(got == want, s"\ngot:  ${got.mkString("\n  ")}\nwant: ${want.mkString("\n  ")}")
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
