package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSuite

class IoSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-io").toString

  test("jsonl round-trip with gzip compression (B1 semantics)") {
    val dir = tmp() + "/out"
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    Sinks.jsonl(df, dir)
    val files = new java.io.File(dir).listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".json.gz"))) // gzip default on
    val back = Sources.jsonl(spark, Seq(dir)).orderBy("id").collect()
    assert(back.map(r => (r.getAs[Long]("id"), r.getAs[String]("v"))).toSeq
      === Seq((1L, "a"), (2L, "b")))
  }

  test("csv reader: DictReader semantics — header names, all strings (A3)") {
    val dir = tmp()
    Files.writeString(java.nio.file.Paths.get(dir, "t.csv"),
      "id,qty\n1,2.5\n3,4.5\n")
    val df = Sources.csv(spark, Seq(s"$dir/t.csv"))
    assert(df.schema.fields.forall(_.dataType.typeName === "string"))
    assert(df.orderBy("id").collect().map(_.getString(1)).toSeq === Seq("2.5", "4.5"))
  }

  test("auto dispatch on extension (pipeline.py:721-735 ext sniffing)") {
    val dir = tmp()
    Files.writeString(java.nio.file.Paths.get(dir, "t.csv"), "a\nx\n")
    assert(Sources.auto(spark, Seq(s"$dir/t.csv")).columns.toSeq === Seq("a"))
    Files.writeString(java.nio.file.Paths.get(dir, "t.jsonl"), "{\"b\": 1}\n")
    assert(Sources.auto(spark, Seq(s"$dir/t.jsonl")).columns.toSeq === Seq("b"))
  }

  test("datedPartitioned: year/month/day directory layout + pruning (B6)") {
    val root = tmp()
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-03-05 10:00:00")),
      (2L, java.sql.Timestamp.valueOf("2024-03-06 11:00:00"))
    ).toDF("id", "created")
    Sinks.datedPartitioned(df, root, "things", "created")
    assert(new java.io.File(s"$root/things/year=2024/month=3/day=5").exists())
    val pruned = spark.read.parquet(s"$root/things")
      .filter(col("day") === 5)
    assert(pruned.collect().map(_.getAs[Long]("id")).toSeq === Seq(1L))
  }

  test("perModelFanOut routes rows by discriminator in one write (B7)") {
    val root = tmp()
    val df = Seq((1L, "users", "a"), (2L, "orders", "b"), (3L, "users", "c"))
      .toDF("id", "_model", "v")
    Sinks.perModelFanOut(df, "_model", root)
    assert(spark.read.parquet(s"$root/_model=users").count() === 2)
    assert(spark.read.parquet(s"$root/_model=orders").count() === 1)
  }

  test("jdbcAppend + jdbcUpsert against embedded Derby (B3/B4)") {
    val url = "jdbc:derby:memory:graftdb;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().execute(
      "CREATE TABLE loads (id BIGINT, v VARCHAR(32))")
    conn.close()

    Sinks.jdbcAppend(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), url, "loads")
    val props = new java.util.Properties()
    assert(spark.read.jdbc(url, "loads", props).count() === 2)

    // upsert: replace id=2, insert id=3 — idempotent on replay
    val up = Seq((2L, "b2"), (3L, "c")).toDF("id", "v")
    Sinks.jdbcUpsert(up, url, "loads", Seq("id"))
    Sinks.jdbcUpsert(up, url, "loads", Seq("id")) // replay must not duplicate
    val got = spark.read.jdbc(url, "loads", props).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === Seq((1L, "a"), (2L, "b2"), (3L, "c")))

    // a batch carrying one key TWICE (and spread across partitions)
    // still lands exactly ONE row for it — without the internal key
    // dedup, DELETE,DELETE,INSERT,INSERT would land both copies
    val dup = Seq((4L, "d1"), (4L, "d2"), (5L, "e"))
      .toDF("id", "v").repartition(3)
    Sinks.jdbcUpsert(dup, url, "loads", Seq("id"))
    val counts = spark.read.jdbc(url, "loads", props)
      .groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts(4L) === 1L && counts(5L) === 1L)
  }

  test("HttpSource: success, retry-then-success on 503, fail-fast on 404") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val server = HttpServer.create(new java.net.InetSocketAddress(0), 0)
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    def respond(ex: HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes("UTF-8")
      ex.sendResponseHeaders(code, if (b.isEmpty) -1 else b.length)
      if (b.nonEmpty) ex.getResponseBody.write(b)
      ex.close()
    }
    server.createContext("/ok", (ex: HttpExchange) =>
      respond(ex, 200, "{\"x\": 1}\n{\"x\": 2}"))
    server.createContext("/flaky", (ex: HttpExchange) => {
      if (hits.incrementAndGet() <= 2) respond(ex, 503, "")
      else respond(ex, 200, "recovered")
    })
    server.createContext("/gone", (ex: HttpExchange) => respond(ex, 404, ""))
    server.start()
    val base = s"http://localhost:${server.getAddress.getPort}"
    try {
      val cfg = HttpSourceConfig(backoffFactorSeconds = 0.01)
      // staged fetch feeds the distributed reader
      val df = HttpSource.fetchJsonlToStaging(spark, s"$base/ok", tmp(), "page1", cfg)
      assert(df.orderBy("x").collect().map(_.getAs[Long]("x")).toSeq === Seq(1L, 2L))
      // 503 is on the force-retry list (ext/clients.py:16-19)
      assert(HttpSource.fetch(s"$base/flaky", cfg) === "recovered")
      assert(hits.get() === 3)
      // 404 is NOT retryable → immediate failure
      val e = intercept[HttpSourceException] { HttpSource.fetch(s"$base/gone", cfg) }
      assert(e.getMessage.contains("404"))
    } finally server.stop(0)
  }

  test("HttpSource auth: static HTTPAuthenticator surface (headers+params+cookies)") {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val server = HttpServer.create(new java.net.InetSocketAddress(0), 0)
    def respond(ex: HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes("UTF-8")
      ex.sendResponseHeaders(code, if (b.isEmpty) -1 else b.length)
      if (b.nonEmpty) ex.getResponseBody.write(b)
      ex.close()
    }
    server.createContext("/guarded", (ex: HttpExchange) => {
      val ok = ex.getRequestHeaders.getFirst("X-Api-Key") == "k1" &&
        ex.getRequestHeaders.getFirst("Cookie") == "session=s1" &&
        ex.getRequestURI.getQuery == "team=data"
      if (ok) respond(ex, 200, "in") else respond(ex, 403, "")
    })
    server.start()
    val base = s"http://localhost:${server.getAddress.getPort}"
    try {
      val cfg = HttpSourceConfig(backoffFactorSeconds = 0.01,
        auth = HttpAuth(
          headers = Map("X-Api-Key" -> "k1"),
          params = Map("team" -> "data"),
          cookies = Map("session" -> "s1")))
      assert(HttpSource.fetch(s"$base/guarded", cfg) === "in")
      // without the auth decoration the same URL fails fast
      intercept[HttpSourceException] { HttpSource.fetch(s"$base/guarded") }
    } finally server.stop(0)
  }

  test("Cookie header merge: session cookies shadow static ones, ONE header emitted") {
    // a static Cookie in cfg.headers plus session auth cookies must
    // collapse to one Cookie value with the session winning per name —
    // .header() appends, which kept a stale pre-login cookie alive
    // after a 401 re-login (same bug class as the Authorization merge)
    assert(HttpSource.mergeCookieHeader(None, Map("session" -> "s2")) === "session=s2")
    assert(HttpSource.mergeCookieHeader(Some("theme=dark"), Map("session" -> "s2"))
      === "theme=dark; session=s2")
    // stale static session cookie is REPLACED, not duplicated
    assert(HttpSource.mergeCookieHeader(Some("session=stale; theme=dark"),
      Map("session" -> "fresh")) === "theme=dark; session=fresh")
    // shadowing is case-insensitive on the cookie name
    assert(HttpSource.mergeCookieHeader(Some("SESSION=stale"),
      Map("session" -> "fresh")) === "session=fresh")
  }

  test("HttpSource login flow: token auth, re-login once on 401 (clients.py:369-448)") {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val server = HttpServer.create(new java.net.InetSocketAddress(0), 0)
    val logins = new java.util.concurrent.atomic.AtomicInteger(0)
    def respond(ex: HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes("UTF-8")
      ex.sendResponseHeaders(code, if (b.isEmpty) -1 else b.length)
      if (b.nonEmpty) ex.getResponseBody.write(b)
      ex.close()
    }
    // login mints v1, v2, …; /data treats v1 as ALREADY EXPIRED (and
    // only honors the latest mint), so the first fetch must walk the
    // full arc: login → v1 → 401 → re-login → v2 → 200.
    server.createContext("/login", (ex: HttpExchange) => {
      if (ex.getRequestHeaders.getFirst("X-Client-Id") != "graft")
        respond(ex, 403, "")
      else {
        val n = logins.incrementAndGet()
        respond(ex, 200, s"""{"headers": {"Authorization": "Token v$n"}}""")
      }
    })
    server.createContext("/data", (ex: HttpExchange) => {
      val tok = ex.getRequestHeaders.getFirst("Authorization")
      if (tok != "Token v1" && tok == s"Token v${logins.get()}")
        respond(ex, 200, "payload")
      else respond(ex, 401, "")
    })
    server.start()
    val base = s"http://localhost:${server.getAddress.getPort}"
    try {
      val loginCfg = HttpLoginConfig(method = "POST", url = base,
        endpoint = "/login", auth = HttpAuth(headers = Map("X-Client-Id" -> "graft")))
      val cfg = HttpSourceConfig(backoffFactorSeconds = 0.01,
        login = Some(loginCfg))
      // expired-token arc: exactly two logins (initial + one re-login)
      assert(HttpSource.fetch(s"$base/data", cfg) === "payload")
      assert(logins.get() === 2)
      // steady state: one login per fetch, no 401 round-trip
      assert(HttpSource.fetch(s"$base/data", cfg) === "payload")
      assert(logins.get() === 3)
      // a login rejected by the server surfaces as a fetch failure
      val badCfg = cfg.copy(login = Some(loginCfg.copy(auth = HttpAuth())))
      val e = intercept[HttpSourceException] { HttpSource.fetch(s"$base/data", badCfg) }
      assert(e.getMessage.contains("login"))
    } finally server.stop(0)
  }

  test("writePackedShards: one directory per (shard, pack), packs intact") {
    import spark.implicits._
    val docs = Seq(
      ("en", 1L, 30), ("en", 2L, 30), ("en", 3L, 30), // en: packs 0,0,1
      ("de", 4L, 55), ("de", 5L, 55)                  // de: starts 0,55 -> packs 0,1
    ).toDF("lang", "id", "toks")
    val out = java.nio.file.Files.createTempDirectory("graft-shards").toString
    Sinks.writePackedShards(docs, "lang", "id", col("toks"),
      budget = 50, outDir = out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .flatMap(l => l.listFiles().filter(_.isDirectory)
        .map(p => s"${l.getName}/${p.getName}")).sorted.toSeq
    assert(dirs === Seq("lang=de/pack_id=0", "lang=de/pack_id=1",
      "lang=en/pack_id=0", "lang=en/pack_id=1"))
    // round trip: partition columns reconstruct the exact assignment
    // (partition-value inference narrows pack_id to int on read)
    val back = spark.read.parquet(out)
      .select(col("lang"), col("id"), col("pack_id").cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(back === Seq(("de", 4L, 0L), ("de", 5L, 1L),
      ("en", 1L, 0L), ("en", 2L, 0L), ("en", 3L, 1L)))
  }

  test("writeShuffledShards: reproducible permutation, no global sort") {
    import spark.implicits._
    val docs = (1L to 500L).map(i => (i, s"doc$i")).toDF("id", "text")
    val out1 = java.nio.file.Files.createTempDirectory("graft-shuf1").toString
    val out2 = java.nio.file.Files.createTempDirectory("graft-shuf2").toString
    Sinks.writeShuffledShards(docs, "id", out1, numShards = 4, salt = "e0")
    Sinks.writeShuffledShards(docs.repartition(7), "id", out2,
      numShards = 4, salt = "e0")
    def shardSeqs(dir: String): Map[Int, Seq[Long]] =
      new java.io.File(dir).listFiles().filter(_.getName.startsWith("shard="))
        .map { d =>
          val n = d.getName.stripPrefix("shard=").toInt
          // one file per shard: single-split read preserves row order
          val f = d.listFiles().filter(_.getName.endsWith(".parquet"))
          assert(f.length === 1, s"expected one file in ${d.getName}")
          n -> spark.read.parquet(f(0).getPath).select("id")
            .collect().map(_.getLong(0)).toSeq
        }.toMap
    val s1 = shardSeqs(out1)
    val s2 = shardSeqs(out2)
    // same shards, same contents, same in-shard order — regardless of
    // the input's partitioning
    assert(s1 === s2)
    assert(s1.values.flatten.toSeq.sorted === (1L to 500L))
    // in-shard order is the salted-hash order, recomputed in-process
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def hash(i: Long): String =
      md.digest(s"e0:$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
    s1.foreach { case (_, ids) =>
      assert(ids === ids.sortBy(hash), "in-shard order must be hash order")
    }
    // a different salt is a different permutation (epoch reshuffle)
    val out3 = java.nio.file.Files.createTempDirectory("graft-shuf3").toString
    Sinks.writeShuffledShards(docs, "id", out3, numShards = 4, salt = "e1")
    assert(shardSeqs(out3) !== s1)
  }

  test("bucketed tables join with no shuffle exchange on either side") {
    import spark.implicits._
    val facts = (1L to 2000L).map(i => (i % 97, s"f$i")).toDF("k", "fv")
    val dims = (0L until 97L).map(i => (i, s"d$i")).toDF("k", "dv")
    Sinks.writeBucketed(facts, "b_facts", Seq("k"), buckets = 8)
    Sinks.writeBucketed(dims, "b_dims", Seq("k"), buckets = 8)
    try {
      // disable broadcast so the join would OTHERWISE be a shuffled SMJ
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_facts").join(spark.table("b_dims"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(1500))
      assert(joined.count() === 2000L)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dims")
    }
  }

  test("HttpSource response hooks observe every attempt (print_request analog)") {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val server = HttpServer.create(new java.net.InetSocketAddress(0), 0)
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    server.createContext("/flaky2", (ex: HttpExchange) => {
      val code = if (hits.incrementAndGet() <= 1) 503 else 200
      val b = "ok".getBytes("UTF-8")
      ex.sendResponseHeaders(code, if (code == 200) b.length else -1)
      if (code == 200) ex.getResponseBody.write(b)
      ex.close()
    })
    server.start()
    val base = s"http://localhost:${server.getAddress.getPort}"
    try {
      val seen = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
      val boom: (String, String, Int) => Unit = (_, _, _) => throw new RuntimeException("hookfail")
      val cfg = HttpSourceConfig(backoffFactorSeconds = 0.01,
        onResponse = Seq((m, _, s) => seen.synchronized { seen += (m -> s) }, boom))
      assert(HttpSource.fetch(s"$base/flaky2", cfg) === "ok")
      // hook saw BOTH attempts (503 then 200); the throwing hook was contained
      assert(seen.toSeq === Seq(("GET", 503), ("GET", 200)))
    } finally server.stop(0)
  }

  test("HttpSource logout: fires with session auth, failures swallowed") {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val server = HttpServer.create(new java.net.InetSocketAddress(0), 0)
    val revoked = new java.util.concurrent.atomic.AtomicReference[String]("")
    server.createContext("/logout", (ex: HttpExchange) => {
      revoked.set(ex.getRequestHeaders.getFirst("Authorization"))
      ex.sendResponseHeaders(204, -1); ex.close()
    })
    server.start()
    val base = s"http://localhost:${server.getAddress.getPort}"
    try {
      val cfg = HttpSourceConfig(
        logout = Some(HttpLogoutConfig("POST", base, "/logout")))
      HttpSource.logout(cfg, HttpAuth(headers = Map("Authorization" -> "Token t9")))
      assert(revoked.get() === "Token t9")
      // unreachable logout endpoint must not throw
      val dead = cfg.copy(logout = Some(HttpLogoutConfig("POST",
        "http://localhost:1", "/logout")))
      HttpSource.logout(dead) // no exception
    } finally server.stop(0)
  }
}
