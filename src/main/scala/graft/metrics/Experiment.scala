package graft.metrics

import org.apache.spark.sql.{DataFrame, functions => F}
import graft.models.{BaseRecommender, RecCols}

/** Models × metrics comparison table (reference: replay/metrics/
  * experiment.py:7-200): fit-predict every candidate model on the same
  * split, evaluate the same metric set over the SHARED enrichment, collect
  * one row per model. */
final class Experiment(
    val metrics: Seq[String],
    val ks: Seq[Int],
    cols: RecCols = RecCols(),
) {
  private val results = scala.collection.mutable.LinkedHashMap.empty[String, Map[String, Double]]

  def addResult(name: String, recs: DataFrame, groundTruth: DataFrame,
      fitPredTime: Double = Double.NaN): this.type = {
    val row = Metrics.compute(recs, groundTruth, metrics, ks, Descriptor.Mean, cols).first()
    val names = for (m <- metrics; k <- ks) yield s"${m}_at_$k"
    results(name) = names.zipWithIndex.map { case (n, i) =>
      n -> (if (row.isNullAt(i)) Double.NaN else row.getDouble(i))
    }.toMap + ("fit_pred_time" -> fitPredTime)
    this
  }

  /** Fit-predict every model, recording wall-clock `fit_pred_time` per
    * model (the column the reference's experiment tables publish and
    * BASELINE timings are built from, res_1m.csv): the rec set is cached
    * and counted inside the timed span so the lazy predict plan actually
    * executes there, then reused by the metric pass. */
  def run(models: Map[String, BaseRecommender], train: DataFrame, test: DataFrame,
      k: Int): this.type = {
    val gt = test.select(cols.query, cols.item).distinct()
    models.foreach { case (name, model) =>
      val t0 = System.nanoTime()
      val recs = model.fitPredict(train, k).cache()
      recs.count()
      val secs = (System.nanoTime() - t0) / 1e9
      addResult(name, recs, gt, secs)
      recs.unpersist()
    }
    this
  }

  /** One row per model, one column per metric@k, plus fit_pred_time
    * (NaN for rows added via addResult without timing). */
  def table(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val names = (for (m <- metrics; k <- ks) yield s"${m}_at_$k").toList :+ "fit_pred_time"
    val rows = results.toSeq.map { case (model, vals) =>
      org.apache.spark.sql.Row.fromSeq(model +: names.map(n =>
        vals.getOrElse(n, Double.NaN)))
    }
    import org.apache.spark.sql.types._
    val schema = StructType(StructField("model", StringType) ::
      names.map(StructField(_, DoubleType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
  }
}

/** Deterministic hyper-parameter search (replacing the reference's Optuna
  * mixin, models/optimization/optuna_mixin.py:17-244): exhaustive grid or
  * seeded random subsample of the grid, scored by a target metric on a
  * holdout split. */
object GridSearch {
  final case class Trial(params: Map[String, Double], score: Double)

  def grid(space: Map[String, Seq[Double]]): Seq[Map[String, Double]] =
    space.foldLeft(Seq(Map.empty[String, Double])) { case (acc, (k, vs)) =>
      for (m <- acc; v <- vs) yield m + (k -> v)
    }

  /** Evaluate `build(params).fitPredict(train)` against test with
    * `metric@k`, maximizing. Runs trials sequentially (each trial is
    * itself fully parallel inside Spark). */
  def search(
      space: Map[String, Seq[Double]],
      build: Map[String, Double] => BaseRecommender,
      train: DataFrame, test: DataFrame,
      metric: String = "ndcg", k: Int = 10,
      maxTrials: Int = Int.MaxValue, seed: Long = 42,
      cols: RecCols = RecCols(),
  ): Seq[Trial] = {
    val all = grid(space)
    val trials =
      if (all.size <= maxTrials) all
      else new scala.util.Random(seed).shuffle(all).take(maxTrials)
    val gt = test.select(cols.query, cols.item).distinct()
    trials.map { params =>
      val recs = build(params).fitPredict(train, k)
      val score = Metrics.compute(recs, gt, Seq(metric), Seq(k), Descriptor.Mean, cols)
        .first().getDouble(0)
      Trial(params, score)
    }.sortBy(-_.score)
  }
}
