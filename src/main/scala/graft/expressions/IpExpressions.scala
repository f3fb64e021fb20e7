package graft.expressions

import java.math.BigInteger

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.Generator
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** IP parse/format kernel with CPython `ipaddress` semantics — the
  * reference's `ip_to_int` / `recast_ip` / `explode_ip_addrs`
  * (utils.py:163-169, 204-224) all route through `ipaddress`, so parity
  * means matching its exact accept/reject grammar:
  *
  *  - IPv4: four decimal octets, 1-3 digits, NO leading zeros, ≤255.
  *  - IPv6: 1-4 hex digit hextets, one optional `::` (must elide ≥1
  *    group), optional dotted-quad tail in the last position, optional
  *    non-empty `%zone` (v6 only, int value ignores it).
  *  - Interface suffix: one `/`; v4 accepts a 0-32 digit prefix, a
  *    contiguous netmask, or a contiguous hostmask; v6 accepts a 0-128
  *    digit prefix only. `int(ip_interface(s))` is the ADDRESS int —
  *    the suffix is validated but does not change the value.
  *  - Formatting: dotted quad below 2^32's worth of v4 inputs; v6 as
  *    lowercase hextets with the longest (leftmost on tie) run of ≥2
  *    zero hextets compressed to `::`.
  *
  * All functions are driver/executor-pure Scala on primitives —
  * `java.net.InetAddress` is avoided (it resolves hostnames).
  */
object IpKernel {
  val V4Max: Long = 0xFFFFFFFFL
  val V6Max: BigInteger = BigInteger.ONE.shiftLeft(128).subtract(BigInteger.ONE)

  /** Strict dotted-quad parse over s[from, until); -1 if invalid. */
  def parseV4(s: String, from: Int, until: Int): Long = {
    var value = 0L
    var octets = 0
    var i = from
    while (octets < 4) {
      var oct = 0
      var len = 0
      while (i < until && s.charAt(i) != '.') {
        val ch = s.charAt(i)
        if (ch < '0' || ch > '9' || len >= 3) return -1L
        oct = oct * 10 + (ch - '0')
        len += 1
        i += 1
      }
      if (len == 0 || oct > 255) return -1L
      if (len > 1 && s.charAt(i - len) == '0') return -1L // no leading zeros
      value = (value << 8) | oct
      octets += 1
      if (octets < 4) {
        if (i >= until || s.charAt(i) != '.') return -1L
        i += 1
      }
    }
    if (i != until) return -1L
    value
  }

  private def hexVal(ch: Char): Int =
    if (ch >= '0' && ch <= '9') ch - '0'
    else if (ch >= 'a' && ch <= 'f') ch - 'a' + 10
    else if (ch >= 'A' && ch <= 'F') ch - 'A' + 10
    else -1

  /** 1-4 hex digit hextet over s[from, until); -1 if invalid. */
  private def parseHextet(s: String, from: Int, until: Int): Int = {
    val len = until - from
    if (len < 1 || len > 4) return -1
    var v = 0
    var i = from
    while (i < until) {
      val h = hexVal(s.charAt(i))
      if (h < 0) return -1
      v = (v << 4) | h
      i += 1
    }
    v
  }

  /** IPv6 parse over s[from, until) (zone already stripped) → 8 hextets,
    * or null if invalid. */
  def parseV6(s: String, from: Int, until: Int): Array[Int] = {
    if (until - from < 2) return null // shortest is "::"
    // locate the (single) "::"
    var dc = -1
    var i = from
    while (i < until - 1) {
      if (s.charAt(i) == ':' && s.charAt(i + 1) == ':') {
        if (dc >= 0) return null
        dc = i
        i += 2
      } else i += 1
    }
    def parseSide(lo: Int, hi: Int, v4TailOk: Boolean): Array[Int] = {
      if (lo >= hi) return Array.emptyIntArray
      val out = new scala.collection.mutable.ArrayBuffer[Int](8)
      var start = lo
      var j = lo
      while (j <= hi) {
        if (j == hi || s.charAt(j) == ':') {
          if (j == hi && v4TailOk && {
                var hasDot = false
                var k = start
                while (k < hi && !hasDot) { if (s.charAt(k) == '.') hasDot = true; k += 1 }
                hasDot
              }) {
            val v4 = parseV4(s, start, hi)
            if (v4 < 0) return null
            out += (v4 >>> 16).toInt
            out += (v4 & 0xFFFF).toInt
          } else {
            val h = parseHextet(s, start, j)
            if (h < 0) return null
            out += h
          }
          start = j + 1
        }
        j += 1
      }
      out.toArray
    }
    if (dc < 0) {
      val parts = parseSide(from, until, v4TailOk = true)
      if (parts == null || parts.length != 8) null else parts
    } else {
      val hiParts = parseSide(from, dc, v4TailOk = false)
      if (hiParts == null) return null
      // chars between "::" and end form the low side; an empty side is ok
      val loParts = parseSide(dc + 2, until, v4TailOk = true)
      if (loParts == null) return null
      // "::" must elide at least one zero group
      if (hiParts.length + loParts.length > 7) return null
      val full = new Array[Int](8)
      System.arraycopy(hiParts, 0, full, 0, hiParts.length)
      System.arraycopy(loParts, 0, full, 8 - loParts.length, loParts.length)
      full
    }
  }

  private def hextetsToBig(h: Array[Int]): BigInteger = {
    val bytes = new Array[Byte](17) // leading zero → non-negative
    var i = 0
    while (i < 8) {
      bytes(1 + 2 * i) = (h(i) >>> 8).toByte
      bytes(2 + 2 * i) = (h(i) & 0xFF).toByte
      i += 1
    }
    new BigInteger(bytes)
  }

  /** True if the string s[from,until) is non-empty ASCII digits (Python's
    * prefix-length grammar: isascii() and isdigit(); leading zeros ok). */
  private def allDigits(s: String, from: Int, until: Int): Boolean = {
    if (from >= until) return false
    var i = from
    while (i < until) {
      val ch = s.charAt(i)
      if (ch < '0' || ch > '9') return false
      i += 1
    }
    true
  }

  private def digitsToInt(s: String, from: Int, until: Int, max: Int): Int = {
    var v = 0
    var i = from
    while (i < until) {
      v = v * 10 + (s.charAt(i) - '0')
      if (v > max) return -1 // monotone: safe early reject, no overflow
      i += 1
    }
    v
  }

  /** Parsed `ip_interface` result: address value, family, prefix length. */
  final case class Iface(value: BigInteger, isV4: Boolean, prefix: Int)

  /** CPython `ipaddress.ip_interface(s)` grammar; null if invalid. */
  def parseInterface(s: String): Iface = {
    if (s == null) return null
    val slash = s.indexOf('/')
    if (slash >= 0 && s.indexOf('/', slash + 1) >= 0) return null // one '/' only
    val addrEnd = if (slash >= 0) slash else s.length
    // v4 vs v6: presence of ':' in the address part
    var isV6 = false
    var i = 0
    while (i < addrEnd && !isV6) { if (s.charAt(i) == ':') isV6 = true; i += 1 }
    if (!isV6) {
      val v = parseV4(s, 0, addrEnd)
      if (v < 0) return null
      val prefix =
        if (slash < 0) 32
        else if (allDigits(s, slash + 1, s.length)) {
          val p = digitsToInt(s, slash + 1, s.length, 32)
          if (p < 0) return null else p
        } else {
          // netmask (contiguous high ones) or hostmask (contiguous low ones)
          val m = parseV4(s, slash + 1, s.length)
          if (m < 0) return null
          val inv = ~m & V4Max
          if ((inv & (inv + 1)) == 0L) java.lang.Long.bitCount(m) // netmask
          else if ((m & (m + 1)) == 0L) 32 - java.lang.Long.bitCount(m) // hostmask
          else return null
        }
      Iface(BigInteger.valueOf(v), isV4 = true, prefix)
    } else {
      // strip %zone (non-empty, v6 only)
      var zoneIdx = -1
      var j = 0
      while (j < addrEnd && zoneIdx < 0) { if (s.charAt(j) == '%') zoneIdx = j; j += 1 }
      val v6End = if (zoneIdx >= 0) zoneIdx else addrEnd
      if (zoneIdx >= 0 && zoneIdx == addrEnd - 1) return null // empty zone
      val hextets = parseV6(s, 0, v6End)
      if (hextets == null) return null
      val prefix =
        if (slash < 0) 128
        else if (allDigits(s, slash + 1, s.length)) {
          val p = digitsToInt(s, slash + 1, s.length, 128)
          if (p < 0) return null else p
        } else return null // v6 accepts digit prefixes only
      Iface(hextetsToBig(hextets), isV4 = false, prefix)
    }
  }

  /** Dotted-quad string for a value known to be in [0, 2^32). */
  def formatV4(v: Long): String = {
    val sb = new java.lang.StringBuilder(15)
    sb.append((v >>> 24) & 255).append('.')
      .append((v >>> 16) & 255).append('.')
      .append((v >>> 8) & 255).append('.')
      .append(v & 255)
    sb.toString
  }

  /** CPython v6 string form: lowercase hextets, longest (leftmost on
    * tie) run of ≥2 zero hextets compressed to `::`. */
  def formatV6(value: BigInteger): String = {
    val h = new Array[Int](8)
    var i = 0
    while (i < 8) {
      h(7 - i) = value.shiftRight(16 * i).and(BigInteger.valueOf(0xFFFF)).intValue()
      i += 1
    }
    // find the best zero run
    var bestStart = -1
    var bestLen = 0
    var runStart = -1
    i = 0
    while (i <= 8) {
      if (i < 8 && h(i) == 0) { if (runStart < 0) runStart = i }
      else {
        if (runStart >= 0 && i - runStart > bestLen) { bestLen = i - runStart; bestStart = runStart }
        runStart = -1
      }
      i += 1
    }
    val sb = new java.lang.StringBuilder(39)
    if (bestLen >= 2) {
      var k = 0
      while (k < bestStart) {
        if (k > 0) sb.append(':')
        sb.append(java.lang.Integer.toHexString(h(k)))
        k += 1
      }
      sb.append("::")
      k = bestStart + bestLen
      while (k < 8) {
        sb.append(java.lang.Integer.toHexString(h(k)))
        if (k < 7) sb.append(':')
        k += 1
      }
    } else {
      var k = 0
      while (k < 8) {
        if (k > 0) sb.append(':')
        sb.append(java.lang.Integer.toHexString(h(k)))
        k += 1
      }
    }
    sb.toString
  }

  /** CPython `str(ip_address(int))`: v4 below 2^32, v6 up to 2^128-1,
    * null outside. */
  def formatAddress(value: BigInteger): String = {
    if (value.signum() < 0 || value.compareTo(V6Max) > 0) null
    else if (value.bitLength() <= 32) formatV4(value.longValue())
    else formatV6(value)
  }
}

/** `graft_ip_to_int(addr)` → LongType: `int(ipaddress.ip_interface(s))`
  * (utils.py:220-224) for every value that fits a signed 64-bit long —
  * all of IPv4 (optionally with `/prefix`, `/netmask`, `/hostmask`) and
  * the low 2^63 of IPv6. Larger v6 ints → null; use
  * `graft_ip_to_int_big` for the full 128-bit range (string digits).
  * Invalid → null (the reference returns None on ValueError).
  */
case class IpToInt(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_ip_to_int"

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftIpToInt", this, classOf[IpToInt].getName)
    val tmp = ctx.freshName("ipLong")
    nullSafeCodeGen(ctx, ev, c =>
      s"""Object $tmp = $ref.compute($c);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) $tmp).longValue(); }""".stripMargin)
  }

  def compute(input: UTF8String): java.lang.Long = {
    val p = IpKernel.parseInterface(input.toString)
    if (p == null || p.value.bitLength() > 63) null
    else java.lang.Long.valueOf(p.value.longValue())
  }

  override protected def withNewChildInternal(newChild: Expression): IpToInt =
    copy(child = newChild)
}

object IpToInt {
  val info: ExpressionInfo = new ExpressionInfo(classOf[IpToInt].getName, "graft_ip_to_int")
  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, s"graft_ip_to_int expects (addr); got ${exprs.length} args")
    IpToInt(exprs.head)
  }
}

/** `graft_ip_to_int_big(addr)` → StringType decimal digits — exact
  * `int(ip_interface(s))` parity across the full IPv4+IPv6 range.
  * Returned as a string because 2^128-1 exceeds both LongType and
  * DecimalType(38); callers needing arithmetic can cast values known to
  * be small. */
case class IpToIntBig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_ip_to_int_big"

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftIpToIntBig", this, classOf[IpToIntBig].getName)
    val tmp = ctx.freshName("ipBig")
    nullSafeCodeGen(ctx, ev, c =>
      s"""Object $tmp = $ref.compute($c);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (UTF8String) $tmp; }""".stripMargin)
  }

  def compute(input: UTF8String): UTF8String = {
    val p = IpKernel.parseInterface(input.toString)
    if (p == null) null else UTF8String.fromString(p.value.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): IpToIntBig =
    copy(child = newChild)
}

object IpToIntBig {
  val info: ExpressionInfo = new ExpressionInfo(classOf[IpToIntBig].getName, "graft_ip_to_int_big")
  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, s"graft_ip_to_int_big expects (addr); got ${exprs.length} args")
    IpToIntBig(exprs.head)
  }
}

/** `graft_recast_ip(intStr)` → StringType: `str(ipaddress.ip_address(i))`
  * (reference `recast_ip`, utils.py:163-169) over the FULL 128-bit
  * range. Input is decimal digits (string — the inverse of
  * `graft_ip_to_int_big`); longs/ints arrive via implicit string cast.
  * <2^32 → dotted quad, <2^128 → compressed v6, outside → null. */
case class IpRecast(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_recast_ip"

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftIpRecast", this, classOf[IpRecast].getName)
    val tmp = ctx.freshName("ipStr")
    nullSafeCodeGen(ctx, ev, c =>
      s"""Object $tmp = $ref.compute($c);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (UTF8String) $tmp; }""".stripMargin)
  }

  def compute(input: UTF8String): UTF8String = {
    val s = input.toString
    val big =
      try new BigInteger(s)
      catch { case _: NumberFormatException => return null }
    val out = IpKernel.formatAddress(big)
    if (out == null) null else UTF8String.fromString(out)
  }

  override protected def withNewChildInternal(newChild: Expression): IpRecast =
    copy(child = newChild)
}

object IpRecast {
  val info: ExpressionInfo = new ExpressionInfo(classOf[IpRecast].getName, "graft_recast_ip")
  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, s"graft_recast_ip expects (intStr); got ${exprs.length} args")
    IpRecast(exprs.head)
  }
}

/** `graft_cidr_hosts(cidr, maxHosts)` — Generator parity with the
  * reference's `explode_ip_addrs` (utils.py:204-217), IPv4 AND IPv6:
  * full-mask input (`/32`, `/128`, bare) yields the address itself;
  * otherwise yields `network.hosts()` — v4 excludes network+broadcast
  * (except /31: both), v6 excludes only the network/anycast address
  * (/127: both).
  *
  * Scale posture: rows stream from a lazy iterator (never a
  * materialized array — a v6 /64 would OOM any array formulation), and
  * a range wider than `maxHosts` FAILS FAST with the offending CIDR in
  * the message rather than silently truncating or grinding through
  * 2^64 rows: at 100 TB one dirty `0.0.0.0/0` row must not hang the
  * stage. Invalid strings yield no rows (the reference `continue`s).
  */
case class CidrHostsGen(child: Expression, maxHosts: Long)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(StructField("ip", StringType) :: Nil)
  override def prettyName: String = "graft_cidr_hosts"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val iface = IpKernel.parseInterface(v.asInstanceOf[UTF8String].toString)
    if (iface == null) return Iterator.empty
    val bits = if (iface.isV4) 32 else 128
    if (iface.prefix == bits) return singleRow(iface.value, iface.isV4)
    val span = BigInteger.ONE.shiftLeft(bits - iface.prefix)
    val network = iface.value.andNot(span.subtract(BigInteger.ONE))
    val top = network.add(span).subtract(BigInteger.ONE)
    val (lo, hi) =
      if (iface.prefix == bits - 1) (network, top) // /31 and /127: both
      else if (iface.isV4) (network.add(BigInteger.ONE), top.subtract(BigInteger.ONE))
      else (network.add(BigInteger.ONE), top) // v6 hosts() keeps the top address
    val n = hi.subtract(lo).add(BigInteger.ONE)
    if (n.compareTo(BigInteger.valueOf(maxHosts)) > 0)
      throw new IllegalArgumentException(
        s"graft_cidr_hosts: '$v' expands to $n addresses (> maxHosts=$maxHosts); " +
          "raise the cap explicitly or pre-filter wide CIDRs")
    val v4 = iface.isV4
    new Iterator[InternalRow] {
      private var cur = lo
      override def hasNext: Boolean = cur.compareTo(hi) <= 0
      override def next(): InternalRow = {
        val row = InternalRow(UTF8String.fromString(CidrHostsGen.fmt(cur, v4)))
        cur = cur.add(BigInteger.ONE)
        row
      }
    }
  }

  private def singleRow(value: BigInteger, isV4: Boolean): Iterator[InternalRow] =
    Iterator.single(InternalRow(UTF8String.fromString(CidrHostsGen.fmt(value, isV4))))

  override protected def withNewChildInternal(newChild: Expression): CidrHostsGen =
    copy(child = newChild)
}

object CidrHostsGen {
  /** Family-aware formatting: a v6 network's low addresses (::, ::1)
    * are SMALL integers but must print as v6 — magnitude-based
    * `formatAddress` is only correct for `recast_ip`'s typeless int
    * input (divergence found by the reference-function fuzz on
    * `::/127`). */
  private[expressions] def fmt(value: BigInteger, isV4: Boolean): String =
    if (isV4) IpKernel.formatV4(value.longValue()) else IpKernel.formatV6(value)

  val DefaultMaxHosts: Long = 1L << 20
  val info: ExpressionInfo = new ExpressionInfo(classOf[CidrHostsGen].getName, "graft_cidr_hosts")
  def builder(exprs: Seq[Expression]): Expression = exprs.length match {
    case 1 => CidrHostsGen(exprs.head, DefaultMaxHosts)
    case 2 =>
      val cap = exprs(1).eval(InternalRow.empty).asInstanceOf[Number].longValue()
      CidrHostsGen(exprs.head, cap)
    case n => throw new IllegalArgumentException(
      s"graft_cidr_hosts expects (cidr[, maxHosts]); got $n args")
  }
}
