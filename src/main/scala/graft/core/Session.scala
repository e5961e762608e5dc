package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory (reference: replay/utils/session_handler.py:22-101):
  * shuffle partitions sized to cores, Kryo, AQE on (runtime re-plan,
  * skew-join splitting, partition coalescing — the reference predates AQE
  * and hand-tuned what AQE now does), off-heap-friendly defaults. */
object Session {
  def build(
      appName: String = "graft",
      master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
      shufflePartitionsPerCore: Int = 3,
  ): SparkSession = {
    val cores = master match {
      case m if m.startsWith("local[") && m != "local[*]" =>
        m.stripPrefix("local[").stripSuffix("]").toInt
      case _ => Runtime.getRuntime.availableProcessors()
    }
    val s = SparkSession.builder()
      .appName(appName)
      .master(master)
      .config("spark.sql.shuffle.partitions", (cores * shufflePartitionsPerCore).toString)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.kryoserializer.buffer.max", "256m")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // ObjectHashAggregate (typed Aggregators, e.g. the bounded top-k
      // crop) falls back to SORT-based aggregation after this many hash
      // map entries — the 128 default turns every >128-query task into
      // the full-stream sort the bounded aggregator exists to avoid.
      // Memory bound is k-DEPENDENT: up to 4M groups × O(k) primitive
      // arrays per task. At the engine's k+maxSeen crops (k ≤ ~10³) that
      // is ≤ a few GB per task; callers with very large k (e.g.
      // enrichBounded at maxK ≫ 10⁴, or heavy-history logs driving
      // maxSeen ≫ 10⁴) should lower this threshold or stay on the
      // rank-window path, which spills.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", (1 << 22).toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Temp-view + cache helper (reference spark_utils.py:654-668). */
  def cacheTempView(df: DataFrame, name: String): DataFrame = {
    df.createOrReplaceTempView(name)
    df.sparkSession.sql(s"CACHE TABLE $name")
    df.sparkSession.table(name)
  }

  /** Bucketed table sink: pre-shuffles a fact table by join key so every
    * later equi-join on `key` is shuffle-free
    * (reference: dataframe_bucketizer.py:89-110). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      path: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite").bucketBy(buckets, key).sortBy(key)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }
}
