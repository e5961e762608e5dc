package graft.core

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Allocation-free single-block MD5 for the portable pair hash.
  *
  * The portable draw `md5("seed:query:item")` (PortableHash.long) is the
  * per-(query, item) hot path of the weighted samplers: at sf0.1 one
  * predict keys |queries| × |catalog| ≈ 300M pairs, and the generic chain
  * pays, PER ROW, two Long→String casts, a concat_ws UTF8String, a
  * getBytes copy, and a MessageDigest round (which itself allocates the
  * 16-byte digest). This object computes the identical 60-bit value from
  * the two longs directly: decimal digits are written into a thread-local
  * 64-byte block, padding + bit length appended per RFC 1321, and one MD5
  * block transform runs in registers. Zero heap allocation per call.
  *
  * BIT-PARITY CONTRACT: the block content is byte-identical to
  * UTF8String.fromString(seed + ":" + q + ":" + i).getBytes, so the first
  * 60 digest bits equal Md5Prefix60.hash60 on the same input — the DuckDB
  * oracle mirror (`('0x' || substr(md5(...), 1, 15))::BIGINT`) is
  * unchanged. Pinned by ExpressionsSpec against the generic chain.
  *
  * The "seed:q:i" string of three longs is at most 3·20+2 = 62 bytes, so
  * the padded message spans one 64-byte block for every realistic seed
  * (≤ 11 digits leaves ≥ 55-byte headroom) and two blocks at the extreme
  * (e.g. Long.MinValue seeds) — both paths share the chained transform.
  */
object FastMd5 {
  // per-round mixers for the unrolled transform; @inline + literal k/s
  // (the RFC 1321 sine table, k(i) = floor(abs(sin(i+1))·2^32), inlined at
  // every call site) lets the JIT constant-fold the shifts; Md5Spec pins
  // the whole digest against java.security.MessageDigest
  @inline private def ff(a: Int, b: Int, c: Int, d: Int, x: Int, s: Int, k: Int): Int =
    b + Integer.rotateLeft(a + ((b & c) | (~b & d)) + x + k, s)
  @inline private def gg(a: Int, b: Int, c: Int, d: Int, x: Int, s: Int, k: Int): Int =
    b + Integer.rotateLeft(a + ((d & b) | (~d & c)) + x + k, s)
  @inline private def hh(a: Int, b: Int, c: Int, d: Int, x: Int, s: Int, k: Int): Int =
    b + Integer.rotateLeft(a + (b ^ c ^ d) + x + k, s)
  @inline private def ii(a: Int, b: Int, c: Int, d: Int, x: Int, s: Int, k: Int): Int =
    b + Integer.rotateLeft(a + (c ^ (b | ~d)) + x + k, s)

  private val words = ThreadLocal.withInitial[Array[Int]](() => new Array[Int](16))

  /** Decimal digit count of a non-negative long — branch ladder, no loop
    * (the r12 writeLong probed the magnitude with a second division loop
    * per operand: 3 such loops per hash on the sampler hot path). */
  @inline private def digitCount(x: Long): Int =
    if (x < 10L) 1 else if (x < 100L) 2 else if (x < 1000L) 3
    else if (x < 10000L) 4 else if (x < 100000L) 5 else if (x < 1000000L) 6
    else if (x < 10000000L) 7 else if (x < 100000000L) 8
    else if (x < 1000000000L) 9 else if (x < 10000000000L) 10
    else if (x < 100000000000L) 11 else if (x < 1000000000000L) 12
    else if (x < 10000000000000L) 13 else if (x < 100000000000000L) 14
    else if (x < 1000000000000000L) 15 else if (x < 10000000000000000L) 16
    else if (x < 100000000000000000L) 17
    else if (x < 1000000000000000000L) 18 else 19

  /** OR byte `v` into the little-endian message words at byte offset
    * `pos` — the words array IS the message block, no byte staging. */
  @inline private def putByteW(m: Array[Int], pos: Int, v: Int): Unit =
    m(pos >> 2) |= (v & 0xff) << ((pos & 3) << 3)

  /** Two ASCII digits per entry: low byte = tens char, high = ones char
    * (the Integer.toString DigitTens/DigitOnes trick) — halves the
    * constant-divisions per operand, and in INT domain where the JIT's
    * magic-multiply is cheapest. */
  private val DIG2: Array[Int] =
    Array.tabulate(100)(n => ('0' + n / 10) | (('0' + n % 10) << 8))

  /** ASCII decimal digits of non-negative x at byte offset pos (nd =
    * digitCount(x)); returns the offset past them. */
  private def putDigits(m: Array[Int], pos: Int, x0: Long, nd: Int): Int = {
    var p = pos + nd - 1
    var x = x0
    // long divisions only while the value exceeds the int range (ids and
    // seeds in practice never do — this loop rarely runs)
    while (x > Int.MaxValue) {
      putByteW(m, p, '0' + (x % 10).toInt)
      x /= 10
      p -= 1
    }
    var xi = x.toInt
    while (xi >= 100) {
      val q = xi / 100
      val r = xi - q * 100
      val d = DIG2(r)
      putByteW(m, p, d >>> 8)
      putByteW(m, p - 1, d & 0xff)
      p -= 2
      xi = q
    }
    if (xi >= 10) {
      val d = DIG2(xi)
      putByteW(m, p, d >>> 8)
      putByteW(m, p - 1, d & 0xff)
    } else putByteW(m, p, '0' + xi)
    pos + nd
  }

  /** First 60 bits of md5("seed:q:i") — bit-identical to
    * Md5Prefix60.hash60 on the same concatenated string (Md5Spec pins
    * both paths against java.security.MessageDigest).
    *
    * r13: the message words are assembled DIRECTLY (digits OR'd into the
    * little-endian word array) instead of the r12 byte-buffer + decode
    * pass — one 16-int zero fill replaces the 64-byte zeroing loop, the
    * per-block word decode, and every byte-array bounds check; measured
    * 267 → ~150 ns/hash driver-side. Negative operands or a message
    * past one block (only reachable with ≥58 total digits) take the
    * MessageDigest fallback — cold by construction. */
  def hash60(seed: Long, q: Long, i: Long): Long =
    hash60(seed, q, i, words.get())

  /** Scratch-supplied variant: codegen callers (Md5Pair60) hold the
    * 16-int block as generated-class state, skipping the per-row
    * ThreadLocal lookup (generated instances are per-task — no sharing). */
  def hash60(seed: Long, q: Long, i: Long, m: Array[Int]): Long = {
    if ((seed | q | i) < 0L) return hash60Fallback(seed, q, i)
    val dS = digitCount(seed)
    val dQ = digitCount(q)
    val dI = digitCount(i)
    val msgLen = dS + dQ + dI + 2
    if (msgLen > 55) return hash60Fallback(seed, q, i)
    java.util.Arrays.fill(m, 0)
    var pos = putDigits(m, 0, seed, dS)
    putByteW(m, pos, ':'); pos += 1
    pos = putDigits(m, pos, q, dQ)
    putByteW(m, pos, ':'); pos += 1
    pos = putDigits(m, pos, i, dI)
    // RFC 1321 single-block padding: 0x80 after the message, bit length
    // little-endian in words 14/15 (15 stays 0 — msgLen·8 < 2^32)
    putByteW(m, pos, 0x80)
    m(14) = msgLen << 3

    {
      val h0 = 0x67452301
      val h1 = 0xefcdab89
      // fully unrolled rounds with literal K/S constants (r12): the loop
      // form paid a K(r)/S(r) array load + message-index arithmetic + loop
      // bookkeeping per step × 64 steps × |queries|·|catalog| pairs on the
      // sampler hot path; unrolling lets the JIT keep a-d in registers and
      // constant-fold every shift. Bit-identical to the RFC 1321 loop
      // (Md5Spec pins against MessageDigest).
      var a = h0
      var b = h1
      var c = 0x98badcfe
      var d = 0x10325476
      val x0 = m(0)
      val x1 = m(1)
      val x2 = m(2)
      val x3 = m(3)
      val x4 = m(4)
      val x5 = m(5)
      val x6 = m(6)
      val x7 = m(7)
      val x8 = m(8)
      val x9 = m(9)
      val x10 = m(10)
      val x11 = m(11)
      val x12 = m(12)
      val x13 = m(13)
      val x14 = m(14)
      val x15 = m(15)
      a = ff(a, b, c, d, x0, 7, 0xd76aa478)
      d = ff(d, a, b, c, x1, 12, 0xe8c7b756)
      c = ff(c, d, a, b, x2, 17, 0x242070db)
      b = ff(b, c, d, a, x3, 22, 0xc1bdceee)
      a = ff(a, b, c, d, x4, 7, 0xf57c0faf)
      d = ff(d, a, b, c, x5, 12, 0x4787c62a)
      c = ff(c, d, a, b, x6, 17, 0xa8304613)
      b = ff(b, c, d, a, x7, 22, 0xfd469501)
      a = ff(a, b, c, d, x8, 7, 0x698098d8)
      d = ff(d, a, b, c, x9, 12, 0x8b44f7af)
      c = ff(c, d, a, b, x10, 17, 0xffff5bb1)
      b = ff(b, c, d, a, x11, 22, 0x895cd7be)
      a = ff(a, b, c, d, x12, 7, 0x6b901122)
      d = ff(d, a, b, c, x13, 12, 0xfd987193)
      c = ff(c, d, a, b, x14, 17, 0xa679438e)
      b = ff(b, c, d, a, x15, 22, 0x49b40821)
      a = gg(a, b, c, d, x1, 5, 0xf61e2562)
      d = gg(d, a, b, c, x6, 9, 0xc040b340)
      c = gg(c, d, a, b, x11, 14, 0x265e5a51)
      b = gg(b, c, d, a, x0, 20, 0xe9b6c7aa)
      a = gg(a, b, c, d, x5, 5, 0xd62f105d)
      d = gg(d, a, b, c, x10, 9, 0x02441453)
      c = gg(c, d, a, b, x15, 14, 0xd8a1e681)
      b = gg(b, c, d, a, x4, 20, 0xe7d3fbc8)
      a = gg(a, b, c, d, x9, 5, 0x21e1cde6)
      d = gg(d, a, b, c, x14, 9, 0xc33707d6)
      c = gg(c, d, a, b, x3, 14, 0xf4d50d87)
      b = gg(b, c, d, a, x8, 20, 0x455a14ed)
      a = gg(a, b, c, d, x13, 5, 0xa9e3e905)
      d = gg(d, a, b, c, x2, 9, 0xfcefa3f8)
      c = gg(c, d, a, b, x7, 14, 0x676f02d9)
      b = gg(b, c, d, a, x12, 20, 0x8d2a4c8a)
      a = hh(a, b, c, d, x5, 4, 0xfffa3942)
      d = hh(d, a, b, c, x8, 11, 0x8771f681)
      c = hh(c, d, a, b, x11, 16, 0x6d9d6122)
      b = hh(b, c, d, a, x14, 23, 0xfde5380c)
      a = hh(a, b, c, d, x1, 4, 0xa4beea44)
      d = hh(d, a, b, c, x4, 11, 0x4bdecfa9)
      c = hh(c, d, a, b, x7, 16, 0xf6bb4b60)
      b = hh(b, c, d, a, x10, 23, 0xbebfbc70)
      a = hh(a, b, c, d, x13, 4, 0x289b7ec6)
      d = hh(d, a, b, c, x0, 11, 0xeaa127fa)
      c = hh(c, d, a, b, x3, 16, 0xd4ef3085)
      b = hh(b, c, d, a, x6, 23, 0x04881d05)
      a = hh(a, b, c, d, x9, 4, 0xd9d4d039)
      d = hh(d, a, b, c, x12, 11, 0xe6db99e5)
      c = hh(c, d, a, b, x15, 16, 0x1fa27cf8)
      b = hh(b, c, d, a, x2, 23, 0xc4ac5665)
      a = ii(a, b, c, d, x0, 6, 0xf4292244)
      d = ii(d, a, b, c, x7, 10, 0x432aff97)
      c = ii(c, d, a, b, x14, 15, 0xab9423a7)
      b = ii(b, c, d, a, x5, 21, 0xfc93a039)
      a = ii(a, b, c, d, x12, 6, 0x655b59c3)
      d = ii(d, a, b, c, x3, 10, 0x8f0ccc92)
      c = ii(c, d, a, b, x10, 15, 0xffeff47d)
      b = ii(b, c, d, a, x1, 21, 0x85845dd1)
      a = ii(a, b, c, d, x8, 6, 0x6fa87e4f)
      d = ii(d, a, b, c, x15, 10, 0xfe2ce6e0)
      c = ii(c, d, a, b, x6, 15, 0xa3014314)
      b = ii(b, c, d, a, x13, 21, 0x4e0811a1)
      a = ii(a, b, c, d, x4, 6, 0xf7537e82)
      d = ii(d, a, b, c, x11, 10, 0xbd3af235)
      c = ii(c, d, a, b, x2, 15, 0x2ad7d2bb)
      b = ii(b, c, d, a, x9, 21, 0xeb86d391)
      val f0 = h0 + a
      val f1 = h1 + b
      // digest bytes 0-7 are f0 then f1, little-endian; hash60 takes the
      // first 15 hex chars = bytes 0-6 + high nibble of byte 7
      // (Md5Prefix60); c/d never surface for a single-block message
      ((f0 & 0xffL) << 52) | ((f0 >>> 8 & 0xffL) << 44) |
        ((f0 >>> 16 & 0xffL) << 36) | ((f0 >>> 24 & 0xffL) << 28) |
        ((f1 & 0xffL) << 20) | ((f1 >>> 8 & 0xffL) << 12) |
        ((f1 >>> 16 & 0xffL) << 4) | ((f1 >>> 24 & 0xffL) >>> 4)
    }
  }

  /** Cold path (negative operands / ≥2-block message): the generic
    * md5-of-string chain — MessageDigest via Md5Prefix60, the very
    * definition of the contract the fast path must match. */
  private def hash60Fallback(seed: Long, q: Long, i: Long): Long =
    Md5Prefix60.hash60(org.apache.spark.unsafe.types.UTF8String.fromString(
      seed.toString + ":" + q + ":" + i))
}

/** Codegen expression for [[FastMd5.hash60]] over two BIGINT columns with a
  * literal seed — the (query, item) sampler hot path. Output is identical
  * to Md5Prefix60 over the concat_ws chain; use that generic form for
  * non-long columns. */
case class Md5Pair60(seed: Long, left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_pair60"

  override def nullSafeEval(a: Any, b: Any): Any =
    FastMd5.hash60(seed, a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the 16-int md5 block lives on the generated class (one instance per
    // task): no ThreadLocal lookup per row on the |queries| × |catalog|
    // sampler stream
    val arr = ctx.addMutableState("int[]", "md5pairWords",
      v => s"$v = new int[16];")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.core.FastMd5.hash60(${seed}L, $a, $b, $arr);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Md5Pair60 =
    copy(left = newLeft, right = newRight)
}

object Md5Pair60 {
  /** Column wrapper; inputs must already be BIGINT (caller dispatches on
    * schema — see PortableHash.uniformPairLong). */
  def apply(seed: Long, a: Column, b: Column): Column =
    GraftExpressionBridge.column(Md5Pair60(seed,
      GraftExpressionBridge.expression(a),
      GraftExpressionBridge.expression(b)))
}
