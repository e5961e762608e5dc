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
  // K(i) = floor(abs(sin(i+1)) * 2^32) — the RFC 1321 sine table, computed
  // rather than transcribed (64 hex constants are a typo magnet)
  private val K: Array[Int] =
    Array.tabulate(64)(i => (math.abs(math.sin(i + 1.0)) * 4294967296.0).toLong.toInt)

  private val S: Array[Int] = Array(
    7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22,
    5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20,
    4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23,
    6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21)

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
      var a = h0
      var b = h1
      var c = h2
      var d = h3
      var r = 0
      while (r < 16) {
        val f = (b & c) | (~b & d)
        val tmp = d
        d = c
        c = b
        b = b + Integer.rotateLeft(a + f + K(r) + m(r), S(r))
        a = tmp
        r += 1
      }
      while (r < 32) {
        val f = (d & b) | (~d & c)
        val tmp = d
        d = c
        c = b
        b = b + Integer.rotateLeft(a + f + K(r) + m((5 * r + 1) & 15), S(r))
        a = tmp
        r += 1
      }
      while (r < 48) {
        val f = b ^ c ^ d
        val tmp = d
        d = c
        c = b
        b = b + Integer.rotateLeft(a + f + K(r) + m((3 * r + 5) & 15), S(r))
        a = tmp
        r += 1
      }
      while (r < 64) {
        val f = c ^ (b | ~d)
        val tmp = d
        d = c
        c = b
        b = b + Integer.rotateLeft(a + f + K(r) + m((7 * r) & 15), S(r))
        a = tmp
        r += 1
      }
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
