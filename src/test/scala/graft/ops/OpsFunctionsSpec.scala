package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.SparkSuite
import graft.ops.{functions => F}

/** Unit coverage for the scalar pack, including the non-oracle operators
  * (SURVEY.md §2.8 footnote): sha224 vectors, snake_case lookahead cases,
  * titlecase divergence, booler's error arm, denormalize's four branches,
  * CIDR expansion.
  */
class OpsFunctionsSpec extends SparkSuite {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    spark.range(1).select(c).collect()(0).getAs[T](0)

  private def overStrings(vals: Seq[Option[String]],
      f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Seq[Any] =
    vals.toDF("v").select(f(col("v"))).collect().toSeq.map(r => if (r.isNullAt(0)) null else r.get(0))

  test("case functions are null-safe (reference utils.py guards)") {
    assert(overStrings(Seq(Some("AbC"), None), F.lowercase) === Seq("abc", null))
    assert(overStrings(Seq(Some("AbC"), None), F.uppercase) === Seq("ABC", null))
  }

  test("titlecase exact CPython str.title parity (utils.py:122-128)") {
    // every expected value is CPython's str.title() output
    val vectors = Seq(
      "hello world" -> "Hello World",
      "o'neil" -> "O'Neil", // cased state resets at apostrophe
      "they're bill's friends from the UK" ->
        "They'Re Bill'S Friends From The Uk",
      "3a 4b" -> "3A 4B", // digits are uncased
      "HELLO-world" -> "Hello-World",
      "a1b c2d" -> "A1B C2D",
      "élan vital" -> "Élan Vital",
      "ǆungla" -> "ǅungla", // Unicode TITLECASE mapping, not uppercase
      "don’t stop" -> "Don’T Stop",
      "foo_bar" -> "Foo_Bar",
      "123" -> "123",
      "MIXeD CaSe" -> "Mixed Case",
      "  spaced  " -> "  Spaced  ",
      "" -> "")
    assert(overStrings(vectors.map(v => Some(v._1)), F.titlecase)
      === vectors.map(_._2))
    assert(overStrings(Seq(None), F.titlecase) === Seq(null))
  }

  test("titlecaseInitcap keeps the whitespace-word Spark behavior") {
    assert(overStrings(Seq(Some("o'neil")), F.titlecaseInitcap) === Seq("O'neil"))
  }

  test("booler truth table (utils.py:131-143)") {
    val got = overStrings(
      Seq(Some("yes"), Some("Y"), Some("1"), Some("TRUE"), Some("t"),
        Some("no"), Some("N"), Some("0"), Some("false"), Some("F"),
        Some(""), None),
      F.booler)
    assert(got === Seq(true, true, true, true, true,
      false, false, false, false, false, null, null))
  }

  test("booler raises on invalid input (reference ValueError arm)") {
    val e = intercept[Exception] {
      Seq("definitely-not-bool").toDF("v").select(F.booler(col("v"))).collect()
    }
    assert(e.getMessage.contains("booler"))
  }

  test("boolerLax maps invalid to null") {
    assert(overStrings(Seq(Some("nope?"), Some("yes")), F.boolerLax)
      === Seq(null, true))
  }

  test("recastNull: empty string to NULL (utils.py:146-151)") {
    assert(overStrings(Seq(Some(""), Some("x"), None), F.recastNull)
      === Seq(null, "x", null))
  }

  test("recastTimestamp: epoch millis (utils.py:154-160)") {
    val ts = one[java.sql.Timestamp](
      F.recastTimestamp(lit(1704067200123L)).cast("timestamp"))
    assert(ts.toInstant.toEpochMilli === 1704067200123L)
  }

  test("recastMac: dash to colon (utils.py:172-177)") {
    assert(overStrings(Seq(Some("AA-BB-CC-DD-EE-FF"), None), F.recastMac)
      === Seq("AA:BB:CC:DD:EE:FF", null))
  }

  test("ipFromInt / ipToInt round-trip and edge cases") {
    assert(one[String](F.ipFromInt(lit(3232235777L))) === "192.168.1.1")
    assert(one[String](F.ipFromInt(lit(0L))) === "0.0.0.0")
    assert(one[String](F.ipFromInt(lit(4294967295L))) === "255.255.255.255")
    assert(one[String](F.ipFromInt(lit(4294967296L))) === null) // out of range
    assert(one[Long](F.ipToInt(lit("192.168.1.1"))) === 3232235777L)
    assert(Seq("999.1.1.1", "1.2.3", "a.b.c.d").toDF("v")
      .select(F.ipToInt(col("v"))).collect().forall(_.isNullAt(0)))
    // property: roundtrip over a spread of the IPv4 space
    val n = spark.range(0, 1000)
      .select((col("id") * 4294967L).as("v"))
      .select(F.ipToInt(F.ipFromInt(col("v"))).as("rt"), col("v"))
      .filter(col("rt") =!= col("v")).count()
    assert(n === 0)
  }

  test("cidrHosts (utils.py:204-217 explode_ip_addrs semantics)") {
    def hosts(s: String): Seq[String] =
      Seq(s).toDF("v").select(F.cidrHosts(col("v"))).collect()(0)
        .getSeq[String](0)
    assert(hosts("10.0.0.1") === Seq("10.0.0.1"))           // plain → itself
    assert(hosts("10.0.0.0/30") === Seq("10.0.0.1", "10.0.0.2")) // hosts() excl net+bcast
    assert(hosts("10.0.0.0/31") === Seq("10.0.0.0", "10.0.0.1")) // /31: both
    assert(hosts("10.0.0.7/32") === Seq("10.0.0.7"))
    assert(hosts("not-an-ip") === Seq())                    // invalid → skipped
  }

  test("splitter exact reference parity (utils.py:84-101)") {
    // reference: split[0] / split[-1] — a no-backslash value returns the
    // WHOLE string on BOTH sides (split yields [s]); multi-backslash
    // takes first and last segments
    val r = Seq("DOM\\alice", "plain", "a\\b\\c").toDF("v")
      .select(F.splitter(col("v")).as("s")).select("s.left", "s.right")
      .collect()
    assert(r(0) === Row("DOM", "alice"))
    assert(r(1) === Row("plain", "plain"))
    assert(r(2) === Row("a", "c"))
  }

  test("hostName exact reference parity (fields.py:85-105, CPython vectors)") {
    // expected tuples produced by executing the reference _serialize
    // logic under CPython (host, _domain, _fqdn):
    val vectors = Seq(
      ("Corp\\hostA", Row("HOSTA", "Corp", null)), // domain keeps case
      ("a\\b\\c", Row("B", "a", null)), // v[1], NOT the last segment
      ("web01.Corp.Example.com",
        Row("WEB01", null, "web01.Corp.Example.com")), // fqdn keeps case
      ("plainhost", Row(null, null, null)), // falls off _serialize → None
      ("x.", Row("X", null, "x.")),
      ("\\x", Row("X", "", null)),
      ("x\\", Row("", "x", null)),
      ("Dom\\Host.example.com", Row("HOST.EXAMPLE.COM", "Dom", null)))
    val r = vectors.map(_._1).toDF("v")
      .select(F.hostName(col("v")).as("h"))
      .select("h.host", "h.domain", "h.fqdn").collect()
    vectors.zip(r).foreach { case ((in, want), got) =>
      assert(got === want, s"input '$in'")
    }
  }

  test("hostNameLenient keeps the divergent friendly behavior") {
    val r = Seq("corp\\web01", "web01.corp.example.com", "web01")
      .toDF("v").select(F.hostNameLenient(col("v")).as("h"))
      .select("h.host", "h.domain", "h.fqdn").collect()
    assert(r(0) === Row("WEB01", "CORP", null))
    assert(r(1) === Row("WEB01", null, "WEB01.CORP.EXAMPLE.COM"))
    assert(r(2) === Row("web01", null, null))
  }

  test("selectHostName flattens side-output columns") {
    val df = F.selectHostName(Seq("corp\\web01").toDF("src"), "src", "host")
    assert(df.columns.toSeq === Seq("src", "host", "host_domain", "host_fqdn"))
    assert(df.collect()(0) === Row("corp\\web01", "WEB01", "corp", null))
  }

  test("sha224 known vectors (reference 'sha256' is really SHA-224, utils.py:35-36)") {
    // java.security.MessageDigest SHA-224("abc")
    assert(one[String](F.sha224(lit("abc")))
      === "23097d223405d8228642a477bda255b32aadbce4bda0b3f7e36c9da7")
    assert(one[String](F.sha224(lit("")))
      === "d14a028c2a3a2bc9476102bb288234c415a2b01f828ea62ac5b3e42f")
  }

  test("camelToSnake exact reference parity (utils.py:181-192)") {
    // expected values are the extracted reference function's outputs:
    // only [A-Z]+ runs followed by [a-z0-9] are rewritten+lowercased;
    // everything else (trailing acronyms, non-ASCII case) passes through
    val cases = Map(
      "CamelCase" -> "camel_case",
      "HTTPResponse" -> "http_response",
      "HTTPResponseCode" -> "http_response_code",
      "camelCase" -> "camel_case",
      "already_snake" -> "already_snake",
      "ABC" -> "ABC", // trailing acronym: UNCHANGED (no [a-z0-9] follows)
      "simpleXML" -> "simpleXML",
      "xY" -> "xY",
      "myABCDef" -> "my_abc_def",
      "_Leading" -> "leading", // lstrip('_') removes pre-existing leads too
      "getHTTPResponseCode" -> "get_http_response_code")
    cases.foreach { case (in, want) =>
      assert(one[String](F.camelToSnake(lit(in))) === want, s"input $in")
    }
  }

  test("camelToSnakeSimple keeps the whole-string-lowercase variant (q38)") {
    assert(one[String](F.camelToSnakeSimple(lit("HTTPResponse"))) === "http_response")
    assert(one[String](F.camelToSnakeSimple(lit("ABC"))) === "abc")
  }

  test("date/time serialization (fields.py:45-82)") {
    val ts = lit("2024-03-05 07:08:09.123456").cast("timestamp")
    assert(one[String](F.isoDate(ts)) === "2024-03-05")
    assert(one[String](F.timeMs(ts)) === "07:08:09.123")
    assert(one[String](F.isoDateTime(ts)) === "2024-03-05T07:08:09.123456Z")
  }

  test("denormalize four branches (utils.py:39-55)") {
    // branch 1: list → one row per element
    val lists = Seq((1, Seq("a", "b")), (2, Seq.empty[String]))
      .toDF("id", "tags")
    val exploded = F.denormalize(lists, "tags").collect()
    assert(exploded.length === 3)
    assert(exploded.map(r => (r.getInt(0), r.getString(1))).sortBy(t => (t._1, Option(t._2).getOrElse(""))).toSeq
      === Seq((1, "a"), (1, "b"), (2, null))) // branch 2: empty → NULL row
    // branch 3: null array → one row with null
    val withNull = Seq((3, null.asInstanceOf[Seq[String]])).toDF("id", "tags")
    assert(F.denormalize(withNull, "tags").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq === Seq((3, null)))
    // branch 4: non-array column → unchanged
    val scalar = Seq((4, "not-a-list")).toDF("id", "tags")
    assert(F.denormalize(scalar, "tags").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq === Seq((4, "not-a-list")))
  }

  test("denormalize row-count invariant: Σ|arrays| + #empty-or-null") {
    val data = Seq(Seq(1, 2, 3), Seq(), null, Seq(9)).zipWithIndex
      .map { case (a, i) => (i, a) }
    val df = data.toDF("id", "xs")
    val expect = data.map { case (_, a) =>
      if (a == null || a.isEmpty) 1 else a.size }.sum
    assert(F.denormalize(df, "xs").count() === expect)
  }

  test("flattenDeep removes fixed nesting depth (utils.py:195-202)") {
    val df = Seq(1).toDF("x").select(
      F.flattenDeep(array(array(array(lit(1), lit(2)), array(lit(3))),
        array(array(lit(4)))), 3).as("f"))
    assert(df.collect()(0).getSeq[Int](0) === Seq(1, 2, 3, 4))
  }

  test("flattenAll derives depth from schema (reference full-recursive flatten)") {
    val df = Seq((1, Seq(Seq(Seq(1, 2), Seq(3)), Seq(Seq(4))))).toDF("id", "xs")
    val flat = F.flattenAll(df, "xs")
    assert(flat.collect()(0).getSeq[Int](1) === Seq(1, 2, 3, 4))
    // already-flat column is a no-op
    val flat1 = F.flattenAll(Seq((1, Seq(7, 8))).toDF("id", "xs"), "xs")
    assert(flat1.collect()(0).getSeq[Int](1) === Seq(7, 8))
  }

  test("tableize naming defaults (model.py:57-59 inflection.tableize)") {
    assert(F.tableize("UserProfile") === "user_profiles")
    assert(F.tableize("Company") === "companies")
    assert(F.tableize("Address") === "addresses")
  }
}
