package graft.splitters

import graft.models.ModelIO

/** Splitter persistence (reference: replay/utils/model_handler.py:152-186
  * `save_splitter`/`load_splitter` — the reference serializes the
  * splitter's `_init_args` plus its class name to `init_args.json` and
  * reconstructs by name).
  *
  * Splitters are pure configuration (no fitted DataFrame state), so the
  * whole round trip is one JSON sidecar in the ModelIO layout. A loaded
  * splitter is `==` to the saved one (case-class equality), so
  * split-after-load ≡ split-before-save by construction — the round-trip
  * specs still assert it on data, mirroring
  * tests/splitters/test_save_load_splitters.py.
  */
object SplitterIO {

  private def common(s: Splitter): Map[String, String] = Map(
    "queryCol" -> s.queryCol, "itemCol" -> s.itemCol,
    "dropColdItems" -> s.dropColdItems.toString,
    "dropColdUsers" -> s.dropColdUsers.toString)

  private val NoneTag = "__none__"
  private def opt(o: Option[String]): String = o.getOrElse(NoneTag)
  private def unopt(s: String): Option[String] =
    if (s == NoneTag) None else Some(s)

  def save(s: Splitter, path: String): Unit = {
    val fields: Map[String, String] = s match {
      case x: RatioSplitter => common(x) ++ Map("kind" -> "ratio",
        "testSize" -> x.testSize.toString, "tsCol" -> x.tsCol,
        "tieCol" -> opt(x.tieCol))
      case x: LastNSplitter => common(x) ++ Map("kind" -> "last_n",
        "n" -> x.n.toString, "byTimeSeconds" -> x.byTimeSeconds.toString,
        "tsCol" -> x.tsCol, "tieCol" -> opt(x.tieCol))
      case x: TimeSplitter => common(x) ++ Map("kind" -> "time",
        "threshold" -> x.threshold, "tsCol" -> x.tsCol)
      case x: HashRandomSplitter => common(x) ++ Map("kind" -> "hash_random",
        "testSize" -> x.testSize.toString, "seed" -> x.seed.toString,
        // comma list; commas in column names are rejected at save time
        "keyCols" -> {
          require(x.keyCols.forall(!_.contains(",")),
            s"keyCols with commas cannot round-trip: ${x.keyCols}")
          x.keyCols.mkString(",")
        })
      case x: NewUsersSplitter => common(x) ++ Map("kind" -> "new_users",
        "testSize" -> x.testSize.toString, "tsCol" -> x.tsCol)
      case x: ColdUserSplitter => common(x) ++ Map("kind" -> "cold_user",
        "testSize" -> x.testSize.toString, "seed" -> x.seed.toString)
      case x: TwoStageSplitter => common(x) ++ Map("kind" -> "two_stage",
        "userFraction" -> x.userFraction.toString,
        "itemTestSize" -> x.itemTestSize.toString, "seed" -> x.seed.toString,
        "tsCol" -> x.tsCol, "tieCol" -> opt(x.tieCol))
      case x: RandomNextNSplitter => common(x) ++ Map("kind" -> "random_next_n",
        "n" -> x.n.toString, "seed" -> x.seed.toString,
        "tsCol" -> x.tsCol, "tieCol" -> opt(x.tieCol))
      case other => throw new IllegalArgumentException(
        s"cannot persist splitter ${other.getClass.getSimpleName}")
    }
    ModelIO.writeJson(path, fields)
  }

  /** KFolds is config-persistable the same way (the reference's KFolds is
    * a Splitter with `_init_args` too; here it has its own API shape). */
  def save(k: KFolds, path: String): Unit =
    ModelIO.writeJson(path, Map("kind" -> "k_folds",
      "nFolds" -> k.nFolds.toString, "seed" -> k.seed.toString,
      "queryCol" -> k.queryCol, "itemCol" -> k.itemCol,
      "dropColdItems" -> k.dropColdItems.toString,
      "dropColdUsers" -> k.dropColdUsers.toString))

  def load(path: String): Splitter = {
    val f = ModelIO.readJson(path)
    val q = f("queryCol"); val i = f("itemCol")
    val dci = f("dropColdItems").toBoolean; val dcu = f("dropColdUsers").toBoolean
    f("kind") match {
      case "ratio" => RatioSplitter(f("testSize").toDouble, q, i, f("tsCol"),
        unopt(f("tieCol")), dci, dcu)
      case "last_n" => LastNSplitter(f("n").toInt, f("byTimeSeconds").toBoolean,
        q, i, f("tsCol"), unopt(f("tieCol")), dci, dcu)
      case "time" => TimeSplitter(f("threshold"), q, i, f("tsCol"), dci, dcu)
      case "hash_random" => HashRandomSplitter(f("testSize").toDouble,
        f("seed").toLong, f("keyCols").split(',').toSeq, q, i, dci, dcu)
      case "new_users" => NewUsersSplitter(f("testSize").toDouble, q, i,
        f("tsCol"), dci, dcu)
      case "cold_user" => ColdUserSplitter(f("testSize").toDouble,
        f("seed").toLong, q, i, dci, dcu)
      case "two_stage" => TwoStageSplitter(f("userFraction").toDouble,
        f("itemTestSize").toDouble, f("seed").toLong, q, i, f("tsCol"),
        unopt(f("tieCol")), dci, dcu)
      case "random_next_n" => RandomNextNSplitter(f("n").toInt,
        f("seed").toLong, q, i, f("tsCol"), unopt(f("tieCol")), dci, dcu)
      case "k_folds" => throw new IllegalArgumentException(
        "path holds a KFolds config; use loadKFolds")
      case other => throw new IllegalArgumentException(
        s"unknown splitter kind $other")
    }
  }

  def loadKFolds(path: String): KFolds = {
    val f = ModelIO.readJson(path)
    require(f("kind") == "k_folds", s"expected k_folds, got ${f("kind")}")
    KFolds(f("nFolds").toInt, f("seed").toLong, f("queryCol"), f("itemCol"),
      f("dropColdItems").toBoolean, f("dropColdUsers").toBoolean)
  }
}
