package graft.core

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Deterministic, mergeable Count-Min sketch expressed as a pure Spark
  * aggregation (Cormode & Muthukrishnan 2005).
  *
  * counter(r, b) = COUNT of stream rows whose row-r portable hash of the
  * key lands in bucket b, for r ∈ [0, depth), b = H_r(key) mod width.
  * Point estimate(key) = min over r of counter(r, H_r(key)) — an upper
  * bound on the true count (never under), within εN with probability
  * 1−δ for width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉.
  *
  * Design for scale:
  *  - The counter table IS a groupBy aggregate: one scan explodes each key
  *    into its `depth` (row, bucket) cells, map-side combine collapses them
  *    to ≤ depth×width partial cells PER PARTITION, and the only shuffle
  *    moves those fixed-size partials — cost is O(depth×width) per
  *    partition regardless of stream size. This is the textbook sketch
  *    merge property falling out of Spark's partial aggregation for free.
  *  - Mergeable across shards/days by counter addition (spec-pinned):
  *    counters(A ∪ B) = counters(A) ⊎ counters(B) summed per cell.
  *  - Hashes are the engine's portable md5 recipe ([[PortableHash]]), so a
  *    DuckDB oracle reproduces every counter exactly AND the sketch is
  *    independent of cluster partitioning; row index seeds the family.
  *  - Works unchanged on a stream (groupBy aggregation in update mode).
  */
object Sketch {
  /** One (row, bucket) cell struct per hash row for the key column. */
  private def cells(keyCol: String, depth: Int, width: Int) =
    F.array((0 until depth).map { r =>
      F.struct(F.lit(r).as("_row"),
        F.pmod(PortableHash.long(r.toLong, F.col(keyCol)),
          F.lit(width.toLong)).as("_bucket"))
    }: _*)

  /** The sketch itself: (row, bucket, counter) for every populated cell.
    * Empty cells are absent (counter 0). */
  def cmsCounters(df: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 64): DataFrame =
    df.select(F.explode(cells(keyCol, depth, width)).as("_c"))
      .groupBy(F.col("_c._row").as("row"), F.col("_c._bucket").as("bucket"))
      .agg(F.count(F.lit(1)).as("counter"))

  /** HyperLogLog registers (Flajolet et al. 2007), deterministic and
    * engine-portable. For each key's 60-bit portable hash h:
    * bucket = top p bits (h >> (60−p)); w = low (60−p) bits;
    * ρ = leading-zero count of w within its (60−p)-bit window + 1 =
    * (60−p) − floor(log₂ w) for w > 0, else (60−p)+1.
    * register(b) = max ρ over the bucket's keys. DENSE output: all 2^p
    * buckets present (empty → 0), so shard merge is a plain per-bucket
    * max and the oracle's shape is fixed.
    *
    * floor(log₂ w) is computed as length(bin(w)) − 1 — INTEGER string
    * arithmetic, identical in any engine, where float log2 near 2^j
    * boundaries rounds differently across libm implementations (log₂(2⁵¹−1)
    * rounds UP to 51.0 in ieee754 double — a cross-engine hash mismatch
    * waiting to happen).
    *
    * Scale shape: identical to the CMS — one scan, map-side combined max,
    * a 2^p-cell shuffle regardless of stream size; mergeable by per-bucket
    * max; streaming-safe (max agg, update mode). */
  /** The (bucket, rho) column pair of the HLL register recipe for one
    * key column — the single definition every register builder (global,
    * grouped, streaming-windowed) derives from, so the DuckDB mirrors
    * stay in lockstep. */
  def hllBucketRho(keyCol: String, p: Int): (org.apache.spark.sql.Column,
      org.apache.spark.sql.Column) = {
    require(p >= 4 && p <= 16, s"p=$p out of range [4,16]")
    val low = 60 - p
    val h = PortableHash.long(0L, F.col(keyCol))
    val bucket = F.shiftrightunsigned(h, low)
    val w = h.bitwiseAND(F.lit((1L << low) - 1L))
    val rho = F.when(w === 0L, F.lit(low + 1))
      .otherwise(F.lit(low) - (F.length(F.bin(w)) - F.lit(1)))
    (bucket, rho)
  }

  def hllRegisters(df: DataFrame, keyCol: String, p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"p=$p out of range [4,16]")
    val m = 1L << p
    val (bucket, rho) = hllBucketRho(keyCol, p)
    val sparse = df.select(bucket.as("bucket"), rho.as("_rho"))
      .groupBy("bucket").agg(F.max("_rho").cast("long").as("register"))
    df.sparkSession.range(m).select(F.col("id").as("bucket"))
      .join(sparse, Seq("bucket"), "left")
      .select(F.col("bucket"),
        F.coalesce(F.col("register"), F.lit(0L)).as("register"))
  }

  /** Per-GROUP HyperLogLog registers, SPARSE: one row per (group, bucket)
    * actually observed (register ≥ 1 by construction — empty buckets are
    * implicit zeros). Dense-per-group would be |groups|·2^p rows; sparse
    * is min(|group's distinct keys|, 2^p) per group, the scalable form
    * for "distinct users per item" on a billion items. Same portable hash
    * and register recipe as [[hllRegisters]], so shard-built frames merge
    * with a groupBy-max and the whole build is ONE partial+final
    * aggregation shuffle keyed on (group, bucket). */
  def hllRegistersByGroup(df: DataFrame, groupCols: Seq[String],
      keyCol: String, p: Int = 12): DataFrame = {
    val (bucket, rho) = hllBucketRho(keyCol, p)
    df.select((groupCols.map(F.col) :+ bucket.as("bucket") :+ rho.as("_rho")): _*)
      .groupBy((groupCols :+ "bucket").map(F.col): _*)
      .agg(F.max("_rho").cast("long").as("register"))
  }

  /** Per-group cardinality estimates from [[hllRegistersByGroup]] output —
    * the same raw-estimator + linear-counting math as [[hllEstimate]],
    * with the empty buckets reconstructed arithmetically (zeros = 2^p −
    * observed buckets; each contributes 2^(rmax−0) to the exact BIGINT
    * power sum — zeros·2^rmax < 2^p·2^(61−p) = 2^61, no overflow for any
    * p). Two keyed aggregations over the SPARSE frame, both tiny. */
  def hllEstimateByGroup(registers: DataFrame, groupCols: Seq[String],
      p: Int = 12): DataFrame = {
    val m = 1L << p
    val alpha = p match {
      case 4 => 0.673
      case 5 => 0.697
      case 6 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    val maxes = registers.groupBy(groupCols.map(F.col): _*)
      .agg(F.max("register").as("_rmax"), F.count(F.lit(1)).as("_nobs"))
    val raw = F.lit(alpha * m * m) * F.pow(2.0, F.col("_rmax")) / F.col("_s")
    registers.join(maxes, groupCols)
      .select((groupCols.map(F.col) ++ Seq(F.col("_rmax"), F.col("_nobs"),
        F.expr("shiftleft(1L, cast(_rmax - register AS INT))").as("_t"))): _*)
      .groupBy((groupCols :+ "_rmax").map(F.col) :+ F.col("_nobs"): _*)
      .agg(F.sum("_t").as("_tobs"))
      .withColumn("_zeros", F.lit(m) - F.col("_nobs"))
      .withColumn("_s", F.col("_tobs") +
        F.col("_zeros") * F.expr("shiftleft(1L, cast(_rmax AS INT))"))
      .select((groupCols.map(F.col) :+
        F.when(F.col("_zeros") > 0L && raw <= F.lit(2.5 * m),
          F.lit(m.toDouble) * F.log(F.lit(m.toDouble) / F.col("_zeros")))
          .otherwise(raw).as("estimate")): _*)
  }

  /** HLL cardinality estimate from a dense register frame: the raw
    * estimator α·m²/Σ2^−Mⱼ with the standard linear-counting correction
    * for the small range (E ≤ 2.5m with empty buckets). The power sum is
    * computed EXACTLY as Σ2^(rmax−Mⱼ) in BIGINT (order-independent; each
    * float Σ2^−Mⱼ would be summation-order-sensitive at the ulp level),
    * so the only float ops are one division and the α constant — both
    * bit-identical across engines. One row: (estimate). */
  def hllEstimate(registers: DataFrame, p: Int = 8): DataFrame = {
    val m = 1L << p
    val alpha = p match {
      case 4 => 0.673
      case 5 => 0.697
      case 6 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    val scalars = registers.agg(F.max("register").as("_rmax"),
      F.sum(F.when(F.col("register") === 0L, 1L).otherwise(0L)).as("_zeros"))
    registers.crossJoin(F.broadcast(scalars))
      .select(F.col("_rmax"), F.col("_zeros"),
        F.expr("shiftleft(1L, cast(_rmax - register AS INT))").as("_t"))
      .groupBy("_rmax", "_zeros")
      .agg(F.sum("_t").as("_s"))
      .select(
        F.when(
          F.col("_zeros") > 0L &&
            (F.lit(alpha * m * m) * F.pow(2.0, F.col("_rmax")) / F.col("_s"))
              <= F.lit(2.5 * m),
          F.lit(m.toDouble) * F.log(F.lit(m.toDouble) / F.col("_zeros")))
          .otherwise(
            F.lit(alpha * m * m) * F.pow(2.0, F.col("_rmax")) / F.col("_s"))
          .as("estimate"))
  }

  /** Point estimates for `keys` (a frame carrying `keyCol`) against a
    * counter table from [[cmsCounters]] built with the SAME depth/width:
    * min over rows of the key's bucket counter; keys hashing only to
    * empty cells estimate 0. The counter side is ≤ depth×width rows —
    * always a broadcast join. */
  def cmsEstimate(counters: DataFrame, keys: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 64): DataFrame =
    keys.select(F.col(keyCol), F.explode(cells(keyCol, depth, width)).as("_c"))
      .join(F.broadcast(counters),
        F.col("_c._row") === F.col("row") &&
          F.col("_c._bucket") === F.col("bucket"), "left")
      .groupBy(keyCol)
      .agg(F.min(F.coalesce(F.col("counter"), F.lit(0L))).as("estimate"))

  /** Shard merge for [[cmsCounters]] tables: per-cell counter addition.
    * counters(A ∪ B) = merge(counters(A), counters(B)) — the property that
    * lets a 100 TB stream build per-partition/per-day sketches
    * independently and combine them in one O(cells) aggregation. */
  def cmsMerge(shards: DataFrame*): DataFrame =
    shards.reduce(_ unionAll _)
      .groupBy("row", "bucket").agg(F.sum("counter").as("counter"))

  /** Shard merge for [[hllRegisters]] tables: per-bucket register max. */
  def hllMerge(shards: DataFrame*): DataFrame =
    shards.reduce(_ unionAll _)
      .groupBy("bucket").agg(F.max("register").as("register"))

  /** Equi-join SIZE estimation from two [[cmsCounters]] tables built with
    * the same depth/width over the two join keys (Cormode & Muthukrishnan
    * 2005 §4.2): |A ⋈ B| is estimated as min over hash rows of the
    * counter inner product Σ_w a[r][w]·b[r][w]. NEVER under the true
    * size (every true pair lands in a shared bucket on every row;
    * collisions only add), over by ≤ ‖a‖₁‖b‖₁/width per row in
    * expectation — the pre-flight a planner wants before committing to a
    * shuffle strategy (broadcast? salt? how many partitions?) on a
    * 100 TB join, priced at two O(depth×width)-cell sketches instead of
    * the join itself.
    *
    * Pure BIGINT: products and sums of exact counters — cell-exact in any
    * engine. Missing cells are empty buckets (counter 0, product 0), so
    * the inner join over populated cells IS the full inner product.
    * Returns one row (estimate BIGINT). */
  def cmsJoinSize(countersA: DataFrame, countersB: DataFrame): DataFrame = {
    val prod = countersA
      .select(F.col("row"), F.col("bucket"), F.col("counter").as("_ca"))
      .join(countersB.select(F.col("row"), F.col("bucket"),
        F.col("counter").as("_cb")), Seq("row", "bucket"))
      .groupBy("row")
      .agg(F.sum(F.col("_ca") * F.col("_cb")).as("_ip"))
    // a hash row with NO shared populated bucket has inner product 0 and
    // must win the min — reattach it from the row domain of either sketch
    countersA.select("row").union(countersB.select("row")).distinct()
      .join(prod, Seq("row"), "left")
      .agg(F.coalesce(F.min(F.coalesce(F.col("_ip"), F.lit(0L))), F.lit(0L))
        .as("estimate"))
  }

  /** HLL set algebra over two register frames (same p): union cardinality
    * is exact sketch composition (per-bucket max — the HLL union is
    * lossless), intersection and Jaccard come from inclusion–exclusion
    * `|A∩B| = |A| + |B| − |A∪B|` (Dasgupta et al. 2016's baseline; the
    * clamp at 0 absorbs estimator noise on near-disjoint sets). One row:
    * (est_a, est_b, est_union, est_intersect, est_jaccard).
    *
    * Error: each estimate carries the standard ~1.04/√m relative error;
    * the intersection inherits the DIFFERENCE of three such terms, so its
    * RELATIVE error scales with |A∪B|/|A∩B| — size p for the union, not
    * the overlap. The audience-overlap / set-similarity answer when the
    * sets themselves are too big to materialize.
    *
    * Scale: three O(2^p) aggregations over fixed-size register frames —
    * independent of the original corpus size; register frames for
    * different days/shards compose via [[hllMerge]] first. */
  def hllOverlap(regsA: DataFrame, regsB: DataFrame, p: Int = 12): DataFrame = {
    val ea = hllEstimate(regsA, p).select(F.col("estimate").as("est_a"))
    val eb = hllEstimate(regsB, p).select(F.col("estimate").as("est_b"))
    val eu = hllEstimate(hllMerge(regsA, regsB), p)
      .select(F.col("estimate").as("est_union"))
    ea.crossJoin(eb).crossJoin(eu)
      .withColumn("est_intersect", F.greatest(F.lit(0.0),
        F.col("est_a") + F.col("est_b") - F.col("est_union")))
      // empty-set convention: J(∅, ∅) = 0.0 (two empty register frames
      // estimate est_union = 0; an unguarded divide returned NULL/NaN)
      .withColumn("est_jaccard", F.when(F.col("est_union") > 0.0,
        F.col("est_intersect") / F.col("est_union")).otherwise(F.lit(0.0)))
  }

  /** Shard merge for [[bloomBits]] tables: per-bit OR (max). */
  def bloomMerge(shards: DataFrame*): DataFrame =
    shards.reduce(_ unionAll _)
      .groupBy("bit").agg(F.max("is_set").as("is_set"))

  /** Bit positions a key sets in an m-bit Bloom filter: one portable hash
    * per hash function index (seed = the index), mod m. Public so join
    * operators (Ops.bloomSemiJoin) can probe row-wise with the identical
    * recipe. */
  def bloomPositions(keyCol: String, numBits: Int, numHashes: Int) =
    F.array((0 until numHashes).map { r =>
      F.pmod(PortableHash.long(r.toLong, F.col(keyCol)), F.lit(numBits.toLong))
    }: _*)

  /** Deterministic, mergeable Bloom filter (Bloom 1970) as a dense bit
    * table: one row per bit ∈ [0, numBits) with `is_set` ∈ {0, 1}.
    *
    * Membership never under-reports (no false negatives, spec-pinned);
    * false-positive rate ≈ (1 − e^(−kn/m))^k for n inserted keys — size
    * numBits ≈ 1.44·n·log₂(1/fpr) for a target rate.
    *
    * Same scale shape as the CMS/HLL: the filter IS a groupBy over bit
    * positions — map-side combine collapses each partition to ≤ numBits
    * cells, so the one shuffle moves O(numBits) rows regardless of stream
    * size; shards merge by per-bit OR (max — spec-pinned); works unchanged
    * on a stream (max agg, update mode). The portable hash family makes
    * every bit DuckDB-reproducible and partition-layout-independent.
    *
    * The 100 TB use: a day's key set compressed to numBits bits becomes a
    * broadcastable "probably seen" pre-filter ahead of an exact dedup
    * anti-join — the anti-join's big-side shuffle then carries only the
    * (1 − fpr-sized) candidate slice instead of the whole corpus. */
  def bloomBits(df: DataFrame, keyCol: String,
      numBits: Int = 1024, numHashes: Int = 4): DataFrame = {
    require(numBits > 0 && numHashes > 0, s"bad bloom shape $numBits/$numHashes")
    val sparse = df
      .select(F.explode(bloomPositions(keyCol, numBits, numHashes)).as("bit"))
      .groupBy("bit").agg(F.lit(1L).as("_one"))
    df.sparkSession.range(numBits).select(F.col("id").as("bit"))
      .join(sparse, Seq("bit"), "left")
      .select(F.col("bit"),
        F.coalesce(F.col("_one"), F.lit(0L)).as("is_set"))
  }

  /** Probabilistic membership for `keys` against a [[bloomBits]] table
    * built with the SAME numBits/numHashes: maybe-present iff every one of
    * the key's numHashes bits is set. The bit table is numBits rows —
    * always a broadcast join; the verdict is min(is_set) over the key's
    * positions, so a key is rejected the moment any position is clear. */
  def bloomMayContain(bits: DataFrame, keys: DataFrame, keyCol: String,
      numBits: Int = 1024, numHashes: Int = 4): DataFrame =
    keys
      .select(F.col(keyCol),
        F.explode(bloomPositions(keyCol, numBits, numHashes)).as("_p"))
      .join(F.broadcast(bits), F.col("_p") === F.col("bit"), "left")
      .groupBy(keyCol)
      .agg((F.min(F.coalesce(F.col("is_set"), F.lit(0L))) === 1L)
        .as("maybe_present"))

  /** Deterministic, mergeable equi-width histogram — the QUANTILE member
    * of the sketch family (CMS counts, HLL distinct, Bloom membership):
    * `bins` integer counters over [lo, hi], out-of-range values clamped
    * into the edge bins. Same scale shape as the others: ONE groupBy
    * whose map-side combine collapses each partition to ≤ bins cells, so
    * the shuffle is O(bins) regardless of stream size; shard merge is
    * per-bin addition ([[histogramMerge]]) — integer adds, so merge is
    * BIT-exact and order-invariant (unlike KLL/t-digest, whose compaction
    * order makes shard merges layout-dependent). Streaming-safe (count
    * agg in update mode).
    *
    * Accuracy contract: rank error ≤ the heaviest bin's mass, value error
    * of [[histogramQuantiles]] ≤ one bin width (the true quantile lies in
    * the bin the cumulative count crosses, and the estimate interpolates
    * inside that bin). Equi-width is the deterministic trade — size
    * `bins` to the value range the way CMS width is sized to the key
    * skew; [[bounds]] supplies (lo, hi) in one exact aggregation. */
  def histogramBins(df: DataFrame, valueCol: String, lo: Double, hi: Double,
      bins: Int = 256): DataFrame = {
    require(hi >= lo, s"need hi >= lo, got [$lo, $hi]")
    require(bins >= 1, s"need bins >= 1, got $bins")
    // degenerate range (constant column / single row): every value lands in
    // bin 0 — the trivial one-bin histogram, not an error. Math.ulp keeps
    // the width positive so the floor below stays finite.
    val w = if (hi > lo) (hi - lo) / bins else Math.ulp(if (hi == 0.0) 1.0 else hi)
    val bin = F.least(
      F.greatest(F.floor((F.col(valueCol).cast("double") - lo) / w), F.lit(0L)),
      F.lit(bins - 1L)).cast("long")
    df.select(bin.as("bin"))
      .groupBy("bin").agg(F.count(F.lit(1)).as("counter"))
  }

  /** Exact (lo, hi) bounds for [[histogramBins]] — one aggregation. An
    * empty (or all-null) column has no bounds: fail with a clear contract
    * error instead of the NPE `getDouble` would throw on the null cells. */
  def bounds(df: DataFrame, valueCol: String): (Double, Double) = {
    val r = df.agg(F.min(F.col(valueCol).cast("double")),
      F.max(F.col(valueCol).cast("double"))).first()
    require(!r.isNullAt(0) && !r.isNullAt(1),
      s"bounds($valueCol): input has no non-null rows")
    (r.getDouble(0), r.getDouble(1))
  }

  /** Total-variation distance between two [[histogramBins]] tables —
    * the libm-free drift metric (PSI's Σ(p−q)ln(p/q) needs a log; TVD
    * `½·Σ|p_bin − q_bin|` is the exact half-L1 and bounds any
    * misclassification-rate shift): per-bin ppm shares floored, absolute
    * differences summed, halved. FULL-outer on the bin id (a bin present
    * on one side only contributes its whole share). Floor leakage
    * < #bins ppm — size `unit` accordingly. One |bins|-sized join +
    * 1-row fold. Returns (bins, tv_ppm). */
  def tvDistance(histA: DataFrame, histB: DataFrame): DataFrame = {
    val na = histA.agg(F.sum("counter")).first().getLong(0)
    val nb = histB.agg(F.sum("counter")).first().getLong(0)
    require(na > 0 && nb > 0, s"tvDistance: empty histogram (a=$na b=$nb)")
    histA.select(F.col("bin"), F.col("counter").as("_ca"))
      .join(histB.select(F.col("bin"), F.col("counter").as("_cb")),
        Seq("bin"), "full_outer")
      .select(F.expr(s"abs(coalesce(_ca, 0L) * 1000000 div ${na}L" +
        s" - coalesce(_cb, 0L) * 1000000 div ${nb}L)").as("_d"))
      .agg(F.count(F.lit(1)).as("bins"),
        F.expr("sum(_d) div 2").as("tv_ppm"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic over integral samples,
    * EXACTLY: `D = max_v |F_a(v) − F_b(v)|` with the empirical CDFs as
    * ppm floors — the cumulative complement of [[tvDistance]] (TVD sees
    * mass moved anywhere; KS sees it moved ACROSS a threshold, the
    * detector for median/shift drift). Per-value counts full-outer
    * merged, cumulated via the DISTRIBUTED range-partitioned prefix sum
    * (never a global window), one max fold. Returns
    * (values, ks_ppm). */
  def ksStatistic(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    def counts(df: DataFrame, out: String) =
      df.select(F.col(valueCol).cast("long").as("v"))
        .groupBy("v").agg(F.count(F.lit(1)).as(out))
    val merged = counts(a, "_ca").join(counts(b, "_cb"), Seq("v"),
        "full_outer")
      .select(F.col("v"), F.coalesce(F.col("_ca"), F.lit(0L)).as("_ca"),
        F.coalesce(F.col("_cb"), F.lit(0L)).as("_cb"))
    val na = merged.agg(F.sum("_ca")).first().getLong(0)
    val nb = merged.agg(F.sum("_cb")).first().getLong(0)
    require(na > 0 && nb > 0, s"ksStatistic: empty sample (a=$na b=$nb)")
    val cum = graft.core.Ops.globalCumsum(
      graft.core.Ops.globalCumsum(merged, "_ca", "_cuma", F.col("v")),
      "_cb", "_cumb", F.col("v"))
    cum.agg(F.count(F.lit(1)).as("values"),
      F.max(F.expr(s"abs(_cuma * 1000000 div ${na}L" +
        s" - _cumb * 1000000 div ${nb}L)")).as("ks_ppm"))
  }

  /** Shard merge for [[histogramBins]] tables: per-bin counter addition. */
  def histogramMerge(shards: DataFrame*): DataFrame =
    shards.reduce(_ unionAll _)
      .groupBy("bin").agg(F.sum("counter").as("counter"))

  /** Quantile estimates from a histogram: for each q, the first bin whose
    * cumulative count reaches q·n, linearly interpolated inside the bin —
    * `est = lo + w·(bin + (q·n − cumBefore)/count_bin)`. The ≤ bins-row
    * cumulative walk runs on the driver (the same bounded contract as the
    * discretizer bin tables); every step is deterministic IEEE
    * arithmetic, so a second engine reproduces each estimate exactly.
    * Output: (q, estimate). */
  /** Per-GROUP equi-width histogram over CALLER-FIXED [lo, hi) bounds,
    * SPARSE (only non-empty (group, bin) cells): the per-source
    * distribution sketch. Fixed global bounds keep every cell a pure
    * function of the row (cross-engine exact, shard-mergeable by
    * groupBy-sum); values outside clamp to the edge bins like
    * [[histogramBins]]. One partial+final aggregation. */
  def histogramBinsByGroup(df: DataFrame, groupCols: Seq[String],
      valueCol: String, lo: Double, hi: Double, bins: Int = 256): DataFrame = {
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    require(bins >= 1, s"need bins >= 1, got $bins")
    val w = (hi - lo) / bins
    val bin = F.least(
      F.greatest(F.floor((F.col(valueCol).cast("double") - lo) / w), F.lit(0L)),
      F.lit(bins - 1L)).cast("long")
    df.select((groupCols.map(F.col) :+ bin.as("bin")): _*)
      .groupBy((groupCols :+ "bin").map(F.col): _*)
      .agg(F.count(F.lit(1)).as("counter"))
  }

  /** Per-group interpolated quantiles from [[histogramBinsByGroup]]
    * output — the [[histogramQuantiles]] walk made RELATIONAL (the
    * driver-side walk would collect |groups|·bins cells): running mass
    * via a window partitioned by group (≤ `bins` rows per partition —
    * bounded by construction, not by data), the picked cell via
    * min_by over the ≥-threshold cells, the estimate in pure column
    * arithmetic. Output: (group…, q, estimate). */
  def histogramQuantilesByGroup(hist: DataFrame, groupCols: Seq[String],
      qs: Seq[Double], lo: Double, hi: Double, bins: Int = 256): DataFrame = {
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    qs.foreach(q => require(q >= 0.0 && q <= 1.0, s"quantile out of range: $q"))
    val w = (hi - lo) / bins
    val spark = hist.sparkSession
    import spark.implicits._
    val win = Window.partitionBy(groupCols.map(F.col): _*).orderBy(F.col("bin").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("_cum", F.sum("counter").over(win))
    val totals = hist.groupBy(groupCols.map(F.col): _*)
      .agg(F.sum("counter").cast("double").as("_n"))
    val t = F.col("q") * F.col("_n")
    cum.join(totals, groupCols)
      .crossJoin(F.broadcast(qs.toDF("q")))
      .filter(F.col("_cum").cast("double") >= t)
      .groupBy((groupCols :+ "q").map(F.col): _*)
      .agg(F.min_by(F.struct(F.col("bin"), F.col("counter"), F.col("_cum")),
        F.col("bin")).as("_c"), F.first(F.col("_n")).as("_n"))
      .select((groupCols.map(F.col) :+ F.col("q") :+
        (F.lit(lo) + F.lit(w) * (F.col("_c.bin") +
          (F.col("q") * F.col("_n") -
            (F.col("_c._cum") - F.col("_c.counter")).cast("double")) /
            F.col("_c.counter").cast("double"))).as("estimate")): _*)
  }

  /** Per-partition Misra-Gries heavy-hitter summaries (Misra & Gries
    * 1982): at most `capacity` counters per partition, decrement-all on
    * overflow. THE frequency member of the sketch family that reports
    * actual KEYS (CMS answers point queries but cannot enumerate): one
    * scan, O(capacity) memory per task regardless of stream size, and
    * the shuffle that follows ([[mgMerge]]) carries ≤ capacity·partitions
    * rows — where an exact groupBy-count would shuffle one row per
    * DISTINCT key (≈ the corpus for URL/shingle-like keys at 100 TB).
    *
    * Per-partition guarantee: true_p(k) − count_p(k) ≤ n_p/(capacity+1).
    * When capacity ≥ the partition's distinct-key count no decrement ever
    * fires and the summary IS the partition's exact counts — in that
    * regime the output is deterministic and order-independent (the gate
    * configuration; the approximate regime is arrival-order-dependent
    * like every MG implementation, spec'd by its error bound instead).
    * Null keys are dropped (counted by no summary), mirroring groupBy. */
  def mgSummaries(df: DataFrame, keyCol: String, capacity: Int): DataFrame = {
    require(capacity >= 1, s"need capacity >= 1, got $capacity")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(F.col(keyCol).cast("long").as("_k")).na.drop("any")
      .as[Long]
      .mapPartitions { it =>
        val m = new java.util.HashMap[Long, Long](capacity * 2)
        while (it.hasNext) {
          val k = it.next()
          // counters are never stored at 0 (decrement removes them), so
          // c == 0 <=> absent — no containsKey double-probe needed
          val c = m.getOrDefault(k, 0L)
          if (c != 0L) m.put(k, c + 1L)
          else if (m.size < capacity) m.put(k, 1L)
          else { // full + new key: decrement every counter, drop zeros.
            // Amortized O(1)/arrival: each decrement round is paid for by
            // the >= capacity increments that filled the counters.
            val e = m.entrySet().iterator()
            while (e.hasNext) {
              val en = e.next()
              if (en.getValue == 1L) e.remove()
              else en.setValue(en.getValue - 1L)
            }
          }
        }
        import scala.jdk.CollectionConverters._
        m.asScala.iterator.map { case (k, v) => (k, v) }
      }
      .toDF("key", "count")
  }

  /** Merge Misra-Gries summaries back to one ≤ `capacity`-key summary
    * (Agarwal et al. 2013, "Mergeable Summaries", Fig. 1): sum counters
    * per key, subtract the (capacity+1)-th largest combined count s (an
    * order statistic — tie-agnostic, hence deterministic), keep the
    * strictly-positive remainder. At most `capacity` keys strictly exceed
    * their own (capacity+1)-th order statistic, so the bound is
    * structural. The error guarantee ADDS across the pipeline:
    * true(k) − count(k) ≤ n_total/(capacity+1) for the full stream.
    *
    * Output: (key, count — the LOWER bound on the true count, err = s —
    * the decrement this merge applied; true(k) ≤ count + n/(capacity+1)).
    * Shape: one groupBy over ≤ capacity·shards rows, one bounded
    * top-(capacity+1) (TakeOrderedAndProject — never a full sort), one
    * broadcast of the 1-row threshold. */
  def mgMerge(summaries: DataFrame, capacity: Int): DataFrame = {
    require(capacity >= 1, s"need capacity >= 1, got $capacity")
    val combined = summaries.groupBy("key").agg(F.sum("count").as("count"))
    val top = combined.orderBy(F.col("count").desc, F.col("key").asc)
      .limit(capacity + 1)
    val thresh = top.agg(
      F.when(F.count(F.lit(1)) > capacity, F.min("count"))
        .otherwise(F.lit(0L)).as("_s"))
    combined.crossJoin(F.broadcast(thresh))
      .filter(F.col("count") - F.col("_s") > 0L)
      .select(F.col("key"), (F.col("count") - F.col("_s")).as("count"),
        F.col("_s").as("err"))
  }

  /** One-call heavy hitters: per-partition MG + merge at the same
    * capacity. ε-approximate top keys with ε = 1/(capacity+1). */
  def mgHeavyHitters(df: DataFrame, keyCol: String, capacity: Int): DataFrame =
    mgMerge(mgSummaries(df, keyCol, capacity), capacity)

  def histogramQuantiles(hist: DataFrame, qs: Seq[Double], lo: Double,
      hi: Double, bins: Int = 256): DataFrame = {
    val w = (hi - lo) / bins
    val cells = hist.select(F.col("bin").cast("long"),
        F.col("counter").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = cells.map(_._2).sum.toDouble
    val ests = qs.map { q =>
      require(q >= 0.0 && q <= 1.0, s"quantile out of range: $q")
      val t = q * n
      var cum = 0.0
      var est = lo
      var found = false
      for ((b, c) <- cells if !found) {
        if (cum + c >= t) {
          est = lo + w * (b + (t - cum) / c)
          found = true
        } else cum += c
      }
      if (!found && cells.nonEmpty) { // t beyond total (fp slack): top edge
        est = lo + w * (cells.last._1 + 1.0)
      }
      (q, est)
    }
    hist.sparkSession.createDataFrame(ests).toDF("q", "estimate")
  }
}
