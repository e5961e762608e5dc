package graft.core

import org.apache.spark.sql.{Column, functions => F}

/** The ONE implementation of the engine-portable seeded hash.
  *
  * `md5(seed ":" col1 ":" col2 …)` → first 15 hex chars → BIGINT in
  * [0, 2^60). Identical in DuckDB as
  * `('0x' || substr(md5(seed || ':' || col), 1, 15))::BIGINT`, which is
  * what makes every seeded split/sample oracle-checkable AND independent
  * of cluster partitioning (unlike rand(seed)). All call sites
  * (splitters, samplers, dedup) must go through here — the oracle SQL
  * mirrors this exact recipe, so a drift in any copy silently breaks
  * cross-engine parity.
  */
object PortableHash {
  /** Hex digest ordering key. */
  def key(seed: Long, cols: Column*): Column =
    F.md5(F.concat_ws(":", (F.lit(seed.toString) +: cols.map(_.cast("string"))): _*))

  /** 60-bit non-negative integer hash. Lowered to the native
    * [[Md5Prefix60]] expression — bit-identical to
    * `conv(substring(key, 1, 15), 16, 10)` (the form the DuckDB oracles
    * keep using) without the hex-string round-trip per row. */
  def long(seed: Long, cols: Column*): Column =
    Md5Prefix60(F.concat_ws(":", (F.lit(seed.toString) +: cols.map(_.cast("string"))): _*))

  /** Uniform double in [0, 1). */
  def uniform(seed: Long, cols: Column*): Column =
    long(seed, cols: _*).cast("double") / F.lit(math.pow(2, 60))

  /** Bit-identical twin of [[uniform]] for the two-BIGINT-column hot path
    * (weighted samplers hash every (query, item) pair): one native
    * [[Md5Pair60]] call that writes "seed:q:i" into a thread-local block
    * and runs a single in-register MD5 transform — no per-row string
    * casts, concat, or MessageDigest allocation. Same 60 bits, same DuckDB
    * oracle. Callers must verify both columns are LongType (see
    * RandomRec.pairUniform for the schema dispatch). */
  def uniformPairLong(seed: Long, a: Column, b: Column): Column =
    Md5Pair60(seed, a, b).cast("double") / F.lit(math.pow(2, 60))

  /** Production fast twin of [[uniform]]: xxhash64 (whole-stage codegen, no
    * per-row md5) → top 60 bits → [0, 1). NOT engine-portable (no DuckDB
    * mirror) and a different draw sequence than the md5 path — reserve for
    * perf-mode sampling where cross-engine parity is not required. */
  def uniformFast(seed: Long, cols: Column*): Column =
    F.shiftrightunsigned(F.xxhash64((F.lit(seed) +: cols): _*), 4)
      .cast("double") / F.lit(math.pow(2, 60))

  /** Mode dispatch: "portable" (md5, oracle-checkable — the default
    * everywhere) | "fast" (xxhash64, ~order-of-magnitude cheaper per draw
    * on wide cross joins). */
  def uniformBy(mode: String, seed: Long, cols: Column*): Column = mode match {
    case "portable" => uniform(seed, cols: _*)
    case "fast"     => uniformFast(seed, cols: _*)
    case other => throw new IllegalArgumentException(
      s"unknown hash mode '$other' (expected portable|fast)")
  }
}
