package graft.models

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}

/** Model persistence (reference: replay/utils/model_handler.py:42-118 +
  * spark_utils.py:789-818 — the reference pickles params into a 1-row
  * parquet for HDFS-safety; here state DataFrames are written as plain
  * parquet plus a JSON params sidecar, the `MLWritable`-style layout). */
object ModelIO {
  private def writeJson(path: String, fields: Map[String, String]): Unit = {
    val body = fields.map { case (k, v) =>
      "\"" + k + "\":\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    }.mkString("{", ",", "}")
    Files.createDirectories(Paths.get(path))
    Files.writeString(Paths.get(s"$path/params.json"), body)
  }

  private def readJson(path: String): Map[String, String] = {
    val raw = Files.readString(Paths.get(s"$path/params.json"))
    """"([^"]+)":"((?:[^"\\]|\\.)*)"""".r.findAllMatchIn(raw)
      .map(m => m.group(1) -> m.group(2).replace("\\\"", "\"").replace("\\\\", "\\"))
      .toMap
  }

  def saveNonPersonalized(m: NonPersonalizedRec, path: String, kind: String): Unit = {
    writeJson(path, Map("kind" -> kind))
    m.itemPopularity.write.mode("overwrite").parquet(s"$path/item_popularity")
  }

  def loadPopRec(spark: SparkSession, path: String): PopRec = {
    require(readJson(path)("kind") == "pop_rec", s"not a PopRec at $path")
    val m = new PopRec()
    m.itemPopularity = spark.read.parquet(s"$path/item_popularity").cache()
    m.fitItemsDf = m.itemPopularity.select(m.cols.item)
    m
  }

  def saveNeighbour(m: NeighbourRec, path: String, kind: String): Unit = {
    writeJson(path, Map("kind" -> kind))
    m.similarity.write.mode("overwrite").parquet(s"$path/similarity")
  }

  def loadItemKNN(spark: SparkSession, path: String): ItemKNN = {
    require(readJson(path)("kind") == "item_knn", s"not an ItemKNN at $path")
    val m = new ItemKNN()
    m.similarity = spark.read.parquet(s"$path/similarity").cache()
    m.fitItemsDf = m.similarity.select(org.apache.spark.sql.functions.col("item_one")
      .as(m.cols.item)).distinct()
    m
  }

  /** Vector-state persistence for Word2VecRec: the fitted item/user
    * vectors are the whole inference state (the MLlib model itself is
    * only needed to fit). The ANN configuration is persisted too, so a
    * save/load roundtrip keeps the model's scoring mode: IVF configs are
    * re-fit over the loaded vectors at load (candidate sets may differ at
    * KMeans-tie boundaries across refits; the recall contract holds);
    * other AnnIndex implementations load as exact. */
  def saveWord2Vec(m: Word2VecRec, path: String): Unit = {
    val annKind = m.ann match {
      case Some(i: IvfAnn) => s"ivf:${i.nCentroids}:${i.nProbe}"
      case Some(l: LshAnn) => s"lsh:${l.planes}:${l.tables}:${l.dims}"
      case Some(other) =>
        throw new IllegalArgumentException(
          s"cannot persist ann index ${other.getClass.getSimpleName}")
      case None => "none"
    }
    writeJson(path, Map("kind" -> "word2vec", "ann" -> annKind))
    m.itemVectors.write.mode("overwrite").parquet(s"$path/item_vectors")
    m.userVectors.write.mode("overwrite").parquet(s"$path/user_vectors")
  }

  def loadWord2Vec(spark: SparkSession, path: String): Word2VecRec = {
    val params = readJson(path)
    require(params("kind") == "word2vec", s"not a Word2VecRec at $path")
    val ann = params.getOrElse("ann", "none") match {
      case s if s.startsWith("ivf:") =>
        val parts = s.split(":")
        Some(new IvfAnn(nCentroids = parts(1).toInt, nProbe = parts(2).toInt))
      case s if s.startsWith("lsh:") =>
        val parts = s.split(":")
        Some(new LshAnn(planes = parts(1).toInt, tables = parts(2).toInt,
          dims = parts(3).toInt))
      case _ => None
    }
    val m = new Word2VecRec(ann = ann)
    m.itemVectors = spark.read.parquet(s"$path/item_vectors").cache()
    m.userVectors = spark.read.parquet(s"$path/user_vectors").cache()
    m.fitItemsDf = m.itemVectors.select(m.cols.item)
    m.fitQueriesDf = m.userVectors.select(m.cols.query)
    ann.foreach(_.fit(m.itemVectors, m.cols.item, "vec"))
    m
  }

  /** Encoder mapping persistence (reference persists the fitted mapping;
    * label_encoder save path). */
  def saveEncoder(e: graft.preprocessing.LabelEncoder, path: String): Unit = {
    writeJson(path, Map("kind" -> "label_encoder", "column" -> e.column))
    e.mapping.write.mode("overwrite").parquet(s"$path/mapping")
  }
}
