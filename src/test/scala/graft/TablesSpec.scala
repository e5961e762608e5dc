package graft

import org.apache.spark.sql.{functions => F}

/** Pins the scan fan-out contract (FIXTURES.md §6b): a small
  * unsplittable scan is widened to session parallelism so pre-shuffle
  * expression chains don't run on one core; a scan that already has real
  * splits is left untouched (the 100 TB case must never pay a
  * repartition of the raw input). */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  private def cores = spark.sparkContext.defaultParallelism

  test("single-file single-row-group scan fans out to session parallelism") {
    val dir = java.nio.file.Files.createTempDirectory("fanout").toString
    (0L until 1000L).toDF("id").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    val loaded = Tables.table(spark, dir, "t")
    assert(loaded.rdd.getNumPartitions >= cores,
      s"expected >= $cores partitions, got ${loaded.rdd.getNumPartitions}")
    // values untouched by the repartition
    assert(loaded.agg(F.sum("id")).first().getLong(0) == 499500L)
    assert(loaded.count() == 1000L)
  }

  test("multi-split scan is left untouched (no repartition of real inputs)") {
    val dir = java.nio.file.Files.createTempDirectory("fanout2").toString
    val nFiles = cores * 2 // enough splits that the guard must skip
    (0L until 1000L).toDF("id").repartition(nFiles)
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    val loaded = Tables.table(spark, dir, "t")
    // plan stays a bare scan: no Exchange anywhere
    val plan = loaded.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Repartition"),
      s"multi-split scan must not repartition:\n${plan.take(400)}")
  }
}
