package graft.core

import org.apache.spark.sql.{DataFrame, functions => F}

/** Distributed PageRank (Brin & Page 1998) in EXACT fixed-point integer
  * arithmetic — the iterative-graph companion to the engine's
  * connected-components operator (text/Dedup.scala `connectedComponentsLS`).
  *
  * Ranks are BIGINT multiples of 1/`unit` with total mass n·unit (the
  * "per-node mass 1" convention, so no division by n appears in the
  * update). One iteration:
  *
  *   contrib(u)  = rank(u) div outdeg(u)            (integer division)
  *   dangShare   = (Σ rank over outdeg=0 nodes) div n
  *   rank'(v)    = unit·(100−d)/100
  *               + (d · (Σ_{u→v} contrib(u) + dangShare)) div 100
  *
  * Every operation is BIGINT +, ·, div — no floats anywhere — so the
  * result is independent of summation order, partitioning, and engine:
  * a SQL engine replays it cell-exactly with `//`. Floor division leaks
  * < outdeg(u) units per contribution and < 100 per node per round, a
  * relative error ≤ ~|E|/(n·unit) per iteration — at unit = 10⁶ that is
  * noise (≤ 10⁻⁴ for graphs with mean degree 100), bought for bit-exact
  * determinism that float PageRank (order-sensitive Σ of doubles) cannot
  * give on a cluster.
  *
  * Scale shape per iteration: one equi-join of ranks against the edge
  * list on src (the edge frame is persisted PRE-PARTITIONED on src once,
  * so every round's join reuses the exchange), one groupBy(dst) partial+
  * final aggregation for the incoming sums, one 1-row scalar aggregate
  * for the dangling mass (broadcast back — never collected per node),
  * and a localCheckpoint truncating the per-round lineage exactly like
  * the connected-components loop. Driver state: the node count and the
  * 1-row dangling frame — O(1) regardless of graph size.
  *
  * Overflow bound: intermediate d·(inc + share) ≤ d·n·unit must stay
  * below 2⁶³ — n < 10¹¹ nodes at the default unit 10⁶, far beyond any
  * physical graph.
  */
object Graph {

  /** PageRank over a directed edge list. Parallel edges are collapsed
    * (the classic unweighted formulation); dangling mass is redistributed
    * uniformly. Returns (node BIGINT, rank BIGINT) with rank in units of
    * 1/`unit` and Σ rank ≈ n·unit (exactly n·unit minus the documented
    * floor-division leakage).
    *
    * @param dampingPct damping factor as an integer percent (85 = the
    *   canonical 0.85) — kept rational so the update stays in BIGINT.
    */
  def pageRank(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
      iterations: Int = 3, dampingPct: Int = 85,
      unit: Long = 1000000L): DataFrame = {
    require(iterations >= 1, s"need iterations >= 1, got $iterations")
    require(dampingPct >= 0 && dampingPct <= 100, s"dampingPct=$dampingPct")
    require(unit >= 100L, s"need unit >= 100, got $unit")
    val spark = edges.sparkSession
    // one-time normalize: collapse parallel edges, pre-partition on src so
    // each round's rank⋈edges join reuses this layout instead of
    // re-shuffling the edge list k times
    val e = edges
      .select(F.col(srcCol).cast("long").as("_src"),
        F.col(dstCol).cast("long").as("_dst"))
      .distinct()
      .repartition(F.col("_src"))
      .localCheckpoint(true)
    val outdeg = e.groupBy(F.col("_src").as("_node"))
      .agg(F.count(F.lit(1)).as("_deg"))
    val nodes = e.select(F.col("_src").as("_node"))
      .union(e.select(F.col("_dst").as("_node")))
      .distinct()
      .join(outdeg, Seq("_node"), "left")
      .select(F.col("_node"), F.coalesce(F.col("_deg"), F.lit(0L)).as("_deg"))
      .localCheckpoint(true)
    val n = nodes.count() // driver scalar: ONE long, the only collect here
    require(n > 0, "pageRank: empty graph")
    val base = unit * (100L - dampingPct) / 100L
    var ranks = nodes.withColumn("_rank", F.lit(unit)).localCheckpoint(true)
    for (_ <- 1 to iterations) {
      val dang = ranks.filter(F.col("_deg") === 0L)
        .agg(F.coalesce(F.sum("_rank"), F.lit(0L)).as("_dangling"))
      val incoming = ranks.filter(F.col("_deg") > 0L)
        .join(e, F.col("_node") === F.col("_src"))
        .select(F.col("_dst").as("_node"),
          F.expr("_rank div _deg").as("_c"))
        .groupBy("_node").agg(F.sum("_c").as("_inc"))
      val next = nodes.join(incoming, Seq("_node"), "left")
        .crossJoin(F.broadcast(dang))
        .select(F.col("_node"), F.col("_deg"),
          (F.lit(base) + F.expr(
            s"($dampingPct * (coalesce(_inc, 0L) + (_dangling div ${n}L))) div 100"))
            .as("_rank"))
        .localCheckpoint(true)
      ranks.unpersist() // superseded checkpoint — don't accumulate blocks
      ranks = next
    }
    val out = ranks.select(F.col("_node").as("node"), F.col("_rank").as("rank"))
    e.unpersist(); nodes.unpersist()
    out
  }

  /** Personalized PageRank (Haveliwala 2002): identical exact-BIGINT
    * update to [[pageRank]], except the teleport mass and the dangling
    * redistribution land ONLY on the `seeds` set instead of uniformly —
    * ranks measure proximity to the seeds, the "related to THESE nodes"
    * primitive behind seed-based recommendation expansion and
    * topic-sensitive ranking.
    *
    *   rank'(v) = [v∈S]·(((100−d)·n·unit) div (100·s))
    *            + (d·Σ_{u→v} contrib(u)) div 100
    *            + [v∈S]·((d·(dangMass div s)) div 100)
    *
    * (s = |S∩nodes|; seeds not present in the graph are ignored). All
    * arithmetic stays BIGINT +/·/div — engine-replayable cell-exactly,
    * like the uniform variant. Initial ranks are uniform (unit per node),
    * matching [[pageRank]]'s recipe; with fixed `iterations` the result
    * is fully deterministic.
    *
    * Scale: the seed set joins in as a broadcast flag (seed frames are
    * small by definition); everything else is the [[pageRank]] shape —
    * pre-partitioned edge join + one groupBy per round, O(1) driver
    * state. */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
      srcCol: String = "src", dstCol: String = "dst",
      seedCol: String = "node", iterations: Int = 3, dampingPct: Int = 85,
      unit: Long = 1000000L): DataFrame = {
    require(iterations >= 1, s"need iterations >= 1, got $iterations")
    require(dampingPct >= 0 && dampingPct <= 100, s"dampingPct=$dampingPct")
    require(unit >= 100L, s"need unit >= 100, got $unit")
    val e = edges
      .select(F.col(srcCol).cast("long").as("_src"),
        F.col(dstCol).cast("long").as("_dst"))
      .distinct()
      .repartition(F.col("_src"))
      .localCheckpoint(true)
    val outdeg = e.groupBy(F.col("_src").as("_node"))
      .agg(F.count(F.lit(1)).as("_deg"))
    val seedSet = seeds.select(F.col(seedCol).cast("long").as("_node"))
      .distinct()
    val nodes = e.select(F.col("_src").as("_node"))
      .union(e.select(F.col("_dst").as("_node")))
      .distinct()
      .join(outdeg, Seq("_node"), "left")
      .join(F.broadcast(seedSet.withColumn("_isSeed", F.lit(true))),
        Seq("_node"), "left")
      .select(F.col("_node"),
        F.coalesce(F.col("_deg"), F.lit(0L)).as("_deg"),
        F.coalesce(F.col("_isSeed"), F.lit(false)).as("_isSeed"))
      .localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "personalizedPageRank: empty graph")
    val s = nodes.filter(F.col("_isSeed")).count()
    require(s > 0, "personalizedPageRank: no seed appears in the graph")
    val baseSeed = (100L - dampingPct) * n * unit / (100L * s)
    var ranks = nodes.withColumn("_rank", F.lit(unit)).localCheckpoint(true)
    for (_ <- 1 to iterations) {
      val dang = ranks.filter(F.col("_deg") === 0L)
        .agg(F.coalesce(F.sum("_rank"), F.lit(0L)).as("_dangling"))
      val incoming = ranks.filter(F.col("_deg") > 0L)
        .join(e, F.col("_node") === F.col("_src"))
        .select(F.col("_dst").as("_node"),
          F.expr("_rank div _deg").as("_c"))
        .groupBy("_node").agg(F.sum("_c").as("_inc"))
      val next = nodes.join(incoming, Seq("_node"), "left")
        .crossJoin(F.broadcast(dang))
        .select(F.col("_node"), F.col("_deg"), F.col("_isSeed"),
          (F.when(F.col("_isSeed"),
            F.lit(baseSeed) + F.expr(
              s"($dampingPct * (_dangling div ${s}L)) div 100"))
            .otherwise(F.lit(0L)) +
            F.expr(s"($dampingPct * coalesce(_inc, 0L)) div 100"))
            .as("_rank"))
        .localCheckpoint(true)
      ranks.unpersist()
      ranks = next
    }
    val out = ranks.select(F.col("_node").as("node"), F.col("_rank").as("rank"))
    e.unpersist(); nodes.unpersist()
    out
  }
}
