package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.ops.{functions => F}

/** CPython-`ipaddress` parity vectors for the native IP expressions.
  * Every expected value below was produced by the reference's own
  * runtime path (`int(ipaddress.ip_interface(s))`,
  * `str(ipaddress.ip_address(i))` — utils.py:163-169, 204-224) under
  * CPython 3, so these lock exact accept/reject-grammar parity, not
  * just happy-path behavior. */
class IpExpressionsSpec extends SparkSuite {
  import spark.implicits._

  private def ipToIntAll(vals: Seq[String]): Seq[Any] =
    vals.toDF("v").select(F.ipToInt(col("v"))).collect()
      .toSeq.map(r => if (r.isNullAt(0)) null else r.getLong(0))

  private def ipToIntBigAll(vals: Seq[String]): Seq[String] =
    vals.toDF("v").select(F.ipToIntBig(col("v"))).collect()
      .toSeq.map(r => r.getString(0))

  private def recastAll(vals: Seq[String]): Seq[String] =
    vals.toDF("v").select(F.recastIp(col("v"))).collect()
      .toSeq.map(r => r.getString(0))

  test("ip_to_int IPv4 vectors (CPython ip_interface parity)") {
    val cases = Seq(
      "1.2.3.4" -> 16909060L,
      "0.0.0.0" -> 0L,
      "255.255.255.255" -> 4294967295L,
      "1.2.3.4/24" -> 16909060L, // prefix validated then ignored
      "1.2.3.4/0" -> 16909060L,
      "1.2.3.4/32" -> 16909060L,
      "1.2.3.4/024" -> 16909060L, // digit prefix may carry leading zeros
      "1.2.3.4/255.255.255.0" -> 16909060L, // netmask form
      "1.2.3.4/0.0.0.255" -> 16909060L, // hostmask form
      "0.0.0.0/0" -> 0L)
    assert(ipToIntAll(cases.map(_._1)) === cases.map(_._2))
  }

  test("ip_to_int rejects exactly what CPython rejects") {
    val invalid = Seq(
      "1.2.3.4/33", // prefix out of range
      "1.2.3.4/255.0.255.0", // non-contiguous mask
      "01.2.3.4", // leading-zero octet
      "1.2.3.256", "1.2.3", "1.2.3.4.5",
      "1.2.3.4/", "1.2.3.4//24", " 1.2.3.4",
      "1.2.3.4%eth0", // zone ids are v6-only
      "1:2:3:4:5:6:7:8:9", "12345::", "g::1", "1::2::3", ":::", "1:",
      "::1::", "00001::", "fe80::1%", // empty zone
      "1:2:3:4:5:1.2.3.4", // v4 tail must complete exactly 8 hextets
      "1:2:3:4:5:6:7:1.2.3.4",
      "2001:db8::/129", "2001:db8::/ffff::", // v6 prefix must be digits
      "2001:db8::1/64%eth0") // zone after prefix
    assert(ipToIntAll(invalid) === invalid.map(_ => null))
  }

  test("ip_to_int small-IPv6 long arm; big values go to ipToIntBig") {
    assert(ipToIntAll(Seq("::1", "::", "::1/128", "::1/0")) ===
      Seq(1L, 0L, 1L, 1L))
    // > 2^63-1 does not fit LongType → null on the long arm…
    assert(ipToIntAll(Seq("2001:db8::1")) === Seq(null))
    // …and exact on the big arm (value from CPython):
    assert(ipToIntBigAll(Seq(
      "2001:db8::1",
      "2001:0db8:0000:0000:0000:0000:0000:0001", // leading zeros ok in hextets
      "::ffff:1.2.3.4", // v4-mapped tail
      "1:2:3:4:5:6:1.2.3.4", // v4 tail completing 8 hextets
      "fe80::1%eth0", // zone id ignored by int()
      "fe80::1%0",
      "fe80::1%eth0/64", // zone before prefix is valid
      "2001:db8::/32", // int(interface) = address int
      "1:2:3:4:5:6:7:8",
      "FFFF::1", // upper-case hex accepted
      "0001:0:0:0:0:0:0:0",
      "1.2.3.4")) === Seq(
      "42540766411282592856903984951653826561",
      "42540766411282592856903984951653826561",
      "281470698652420",
      "5192455318486707404433266449711876",
      "338288524927261089654018896841347694593",
      "338288524927261089654018896841347694593",
      "338288524927261089654018896841347694593",
      "42540766411282592856903984951653826560",
      "5192455318486707404433266433261576",
      "340277174624079928635746076935438991361",
      "5192296858534827628530496329220096",
      "16909060"))
  }

  test("recast_ip full-range vectors (CPython str(ip_address(int)))") {
    val cases = Seq(
      "0" -> "0.0.0.0",
      "1" -> "0.0.0.1",
      "16909060" -> "1.2.3.4",
      "4294967295" -> "255.255.255.255",
      "4294967296" -> "::1:0:0", // first v6 value
      "9223372036854775807" -> "::7fff:ffff:ffff:ffff",
      "-1" -> null,
      "340282366920938463463374607431768211455" ->
        "ffff:ffff:ffff:ffff:ffff:ffff:ffff:ffff",
      "340282366920938463463374607431768211456" -> null, // 2^128
      "42540766411282592856903984951653826561" -> "2001:db8::1",
      "281470698652516" -> "::ffff:102:364",
      "not-an-int" -> null)
    assert(recastAll(cases.map(_._1)) === cases.map(_._2))
  }

  test("v6 formatting compresses the longest leftmost run of ≥2 zeros") {
    // via round-trip: parse the uncompressed form, format back
    val roundTrips = Seq(
      "2001:db8:0:1:1:1:1:1" -> "2001:db8:0:1:1:1:1:1", // single zero: no ::
      "2001:0:0:1:0:0:0:1" -> "2001:0:0:1::1", // longer run wins
      "1:0:0:0:2:0:0:0" -> "1::2:0:0:0", // tie → leftmost
      "0:0:1:0:0:0:0:0" -> "0:0:1::", // trailing run
      "1:0:2:0:3:0:4:0" -> "1:0:2:0:3:0:4:0") // no run of ≥2
    val got = recastAll(ipToIntBigAll(roundTrips.map(_._1)))
    assert(got === roundTrips.map(_._2))
  }

  test("explodeCidr generator: v4 host semantics (explode_ip_addrs parity)") {
    def hosts(cidr: String): Seq[String] =
      Seq(cidr).toDF("c").select(F.explodeCidr(col("c")).as("ip"))
        .collect().toSeq.map(_.getString(0))
    assert(hosts("10.0.0.0/30") === Seq("10.0.0.1", "10.0.0.2"))
    assert(hosts("10.0.0.0/31") === Seq("10.0.0.0", "10.0.0.1")) // /31: both
    assert(hosts("10.0.0.7/32") === Seq("10.0.0.7")) // full mask: the address
    assert(hosts("10.0.0.7") === Seq("10.0.0.7")) // bare address
    assert(hosts("10.0.1.77/24") ===
      (1 to 254).map(i => s"10.0.1.$i")) // network+broadcast excluded
    assert(hosts("bogus") === Seq.empty) // invalid: skipped, no rows
  }

  test("explodeCidr generator: v6 host semantics and fail-fast cap") {
    def hosts(cidr: String): Seq[String] =
      Seq(cidr).toDF("c").select(F.explodeCidr(col("c")).as("ip"))
        .collect().toSeq.map(_.getString(0))
    // v6 hosts() excludes only the network (anycast) address
    assert(hosts("2001:db8::/126") ===
      Seq("2001:db8::1", "2001:db8::2", "2001:db8::3"))
    assert(hosts("2001:db8::/127") === Seq("2001:db8::", "2001:db8::1"))
    assert(hosts("2001:db8::5/128") === Seq("2001:db8::5"))
    // a /64 must fail fast with the offending CIDR named, not hang
    val err = intercept[org.apache.spark.SparkException] {
      Seq("2001:db8::/64").toDF("c")
        .select(F.explodeCidr(col("c")).as("ip")).collect()
    }
    assert(err.getMessage.contains("graft_cidr_hosts") ||
      err.getCause.getMessage.contains("graft_cidr_hosts"))
  }

  test("ipToInt(ipFromInt) round-trips arbitrary 32-bit values (q19 path)") {
    val df = spark.range(0, 5000)
      .select(((col("id") * 2654435761L) % 4294967296L).as("v"))
    val bad = df.select(col("v"),
        F.ipToInt(F.ipFromInt(col("v"))).as("rt"))
      .where(col("rt") =!= col("v") || col("rt").isNull)
    assert(bad.count() === 0)
  }
}
