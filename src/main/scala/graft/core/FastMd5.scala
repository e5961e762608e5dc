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

  private val block = ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](128))
  private val words = ThreadLocal.withInitial[Array[Int]](() => new Array[Int](16))

  private val MIN_LONG_BYTES = Long.MinValue.toString.getBytes("US-ASCII")

  /** Writes the decimal representation of v at buf(off); returns the new
    * offset. Matches Long.toString byte-for-byte (incl. the '-' sign). */
  private def writeLong(buf: Array[Byte], off: Int, v: Long): Int = {
    if (v == Long.MinValue) {
      System.arraycopy(MIN_LONG_BYTES, 0, buf, off, MIN_LONG_BYTES.length)
      return off + MIN_LONG_BYTES.length
    }
    var o = off
    var x = v
    if (x < 0) { buf(o) = '-'; o += 1; x = -x }
    var digits = 1
    var probe = x
    while (probe >= 10) { probe /= 10; digits += 1 }
    var p = o + digits - 1
    while (p >= o) {
      buf(p) = ('0' + (x % 10)).toByte
      x /= 10
      p -= 1
    }
    o + digits
  }

  /** First 60 bits of md5("seed:q:i") — bit-identical to
    * Md5Prefix60.hash60 on the same concatenated string. */
  def hash60(seed: Long, q: Long, i: Long): Long = {
    val buf = block.get()
    var n = writeLong(buf, 0, seed)
    buf(n) = ':'; n += 1
    n = writeLong(buf, n, q)
    buf(n) = ':'; n += 1
    n = writeLong(buf, n, i)
    val msgLen = n
    // RFC 1321 padding: 0x80, zeros to 8-before-a-block-boundary, then the
    // bit length little-endian. One block when the message fits ≤ 55 bytes
    // (every realistic seed), two at the 56-62-byte extreme.
    val total = if (msgLen <= 55) 64 else 128
    buf(n) = 0x80.toByte; n += 1
    while (n < total - 8) { buf(n) = 0; n += 1 }
    val bitLen = msgLen.toLong << 3
    var j = 0
    while (j < 8) { buf(total - 8 + j) = (bitLen >>> (8 * j)).toByte; j += 1 }

    // chained block transforms; only (a, b) of the final digest are needed
    var h0 = 0x67452301
    var h1 = 0xefcdab89
    var h2 = 0x98badcfe
    var h3 = 0x10325476
    val m = words.get()
    var base = 0
    while (base < total) {
      // decode the 16 little-endian message words ONCE per block (decoding
      // inside the round loop would redo each 4-byte assembly 4 times)
      var w = 0
      while (w < 16) {
        val o = base + (w << 2)
        m(w) = (buf(o) & 0xff) | ((buf(o + 1) & 0xff) << 8) |
          ((buf(o + 2) & 0xff) << 16) | ((buf(o + 3) & 0xff) << 24)
        w += 1
      }
      // fully unrolled rounds with literal K/S constants (r12): the loop
      // form paid a K(r)/S(r) array load + message-index arithmetic + loop
      // bookkeeping per step × 64 steps × |queries|·|catalog| pairs on the
      // sampler hot path; unrolling lets the JIT keep a-d in registers and
      // constant-fold every shift. Bit-identical to the RFC 1321 loop
      // (Md5Spec pins against MessageDigest).
      var a = h0
      var b = h1
      var c = h2
      var d = h3
      a = ff(a, b, c, d, m(0), 7, 0xd76aa478)
      d = ff(d, a, b, c, m(1), 12, 0xe8c7b756)
      c = ff(c, d, a, b, m(2), 17, 0x242070db)
      b = ff(b, c, d, a, m(3), 22, 0xc1bdceee)
      a = ff(a, b, c, d, m(4), 7, 0xf57c0faf)
      d = ff(d, a, b, c, m(5), 12, 0x4787c62a)
      c = ff(c, d, a, b, m(6), 17, 0xa8304613)
      b = ff(b, c, d, a, m(7), 22, 0xfd469501)
      a = ff(a, b, c, d, m(8), 7, 0x698098d8)
      d = ff(d, a, b, c, m(9), 12, 0x8b44f7af)
      c = ff(c, d, a, b, m(10), 17, 0xffff5bb1)
      b = ff(b, c, d, a, m(11), 22, 0x895cd7be)
      a = ff(a, b, c, d, m(12), 7, 0x6b901122)
      d = ff(d, a, b, c, m(13), 12, 0xfd987193)
      c = ff(c, d, a, b, m(14), 17, 0xa679438e)
      b = ff(b, c, d, a, m(15), 22, 0x49b40821)
      a = gg(a, b, c, d, m(1), 5, 0xf61e2562)
      d = gg(d, a, b, c, m(6), 9, 0xc040b340)
      c = gg(c, d, a, b, m(11), 14, 0x265e5a51)
      b = gg(b, c, d, a, m(0), 20, 0xe9b6c7aa)
      a = gg(a, b, c, d, m(5), 5, 0xd62f105d)
      d = gg(d, a, b, c, m(10), 9, 0x02441453)
      c = gg(c, d, a, b, m(15), 14, 0xd8a1e681)
      b = gg(b, c, d, a, m(4), 20, 0xe7d3fbc8)
      a = gg(a, b, c, d, m(9), 5, 0x21e1cde6)
      d = gg(d, a, b, c, m(14), 9, 0xc33707d6)
      c = gg(c, d, a, b, m(3), 14, 0xf4d50d87)
      b = gg(b, c, d, a, m(8), 20, 0x455a14ed)
      a = gg(a, b, c, d, m(13), 5, 0xa9e3e905)
      d = gg(d, a, b, c, m(2), 9, 0xfcefa3f8)
      c = gg(c, d, a, b, m(7), 14, 0x676f02d9)
      b = gg(b, c, d, a, m(12), 20, 0x8d2a4c8a)
      a = hh(a, b, c, d, m(5), 4, 0xfffa3942)
      d = hh(d, a, b, c, m(8), 11, 0x8771f681)
      c = hh(c, d, a, b, m(11), 16, 0x6d9d6122)
      b = hh(b, c, d, a, m(14), 23, 0xfde5380c)
      a = hh(a, b, c, d, m(1), 4, 0xa4beea44)
      d = hh(d, a, b, c, m(4), 11, 0x4bdecfa9)
      c = hh(c, d, a, b, m(7), 16, 0xf6bb4b60)
      b = hh(b, c, d, a, m(10), 23, 0xbebfbc70)
      a = hh(a, b, c, d, m(13), 4, 0x289b7ec6)
      d = hh(d, a, b, c, m(0), 11, 0xeaa127fa)
      c = hh(c, d, a, b, m(3), 16, 0xd4ef3085)
      b = hh(b, c, d, a, m(6), 23, 0x04881d05)
      a = hh(a, b, c, d, m(9), 4, 0xd9d4d039)
      d = hh(d, a, b, c, m(12), 11, 0xe6db99e5)
      c = hh(c, d, a, b, m(15), 16, 0x1fa27cf8)
      b = hh(b, c, d, a, m(2), 23, 0xc4ac5665)
      a = ii(a, b, c, d, m(0), 6, 0xf4292244)
      d = ii(d, a, b, c, m(7), 10, 0x432aff97)
      c = ii(c, d, a, b, m(14), 15, 0xab9423a7)
      b = ii(b, c, d, a, m(5), 21, 0xfc93a039)
      a = ii(a, b, c, d, m(12), 6, 0x655b59c3)
      d = ii(d, a, b, c, m(3), 10, 0x8f0ccc92)
      c = ii(c, d, a, b, m(10), 15, 0xffeff47d)
      b = ii(b, c, d, a, m(1), 21, 0x85845dd1)
      a = ii(a, b, c, d, m(8), 6, 0x6fa87e4f)
      d = ii(d, a, b, c, m(15), 10, 0xfe2ce6e0)
      c = ii(c, d, a, b, m(6), 15, 0xa3014314)
      b = ii(b, c, d, a, m(13), 21, 0x4e0811a1)
      a = ii(a, b, c, d, m(4), 6, 0xf7537e82)
      d = ii(d, a, b, c, m(11), 10, 0xbd3af235)
      c = ii(c, d, a, b, m(2), 15, 0x2ad7d2bb)
      b = ii(b, c, d, a, m(9), 21, 0xeb86d391)
      h0 += a
      h1 += b
      h2 += c
      h3 += d
      base += 64
    }

    // digest bytes 0-7 are h0 then h1, little-endian; hash60 takes the
    // first 15 hex chars = bytes 0-6 + high nibble of byte 7 (Md5Prefix60)
    ((h0 & 0xffL) << 52) | ((h0 >>> 8 & 0xffL) << 44) | ((h0 >>> 16 & 0xffL) << 36) |
      ((h0 >>> 24 & 0xffL) << 28) | ((h1 & 0xffL) << 20) | ((h1 >>> 8 & 0xffL) << 12) |
      ((h1 >>> 16 & 0xffL) << 4) | ((h1 >>> 24 & 0xffL) >>> 4)
  }
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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.core.FastMd5.hash60(${seed}L, $a, $b);")

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
