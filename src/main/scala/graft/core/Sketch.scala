package graft.core

import org.apache.spark.sql.{DataFrame, functions => F}

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
}
