package graft.sources

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._
import graft.SparkSuite

class HttpJsonlSourceSpec extends SparkSuite {

  private def withServer(pages: Map[Int, String])(f: String => Unit): Unit = {
    val server = HttpServer.create(new java.net.InetSocketAddress(0), 0)
    val authedPages = new java.util.concurrent.atomic.AtomicInteger(0)
    def respond(ex: HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes("UTF-8")
      ex.sendResponseHeaders(code, if (b.isEmpty) -1 else b.length)
      if (b.nonEmpty) ex.getResponseBody.write(b)
      ex.close()
    }
    server.createContext("/items", (ex: HttpExchange) => {
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      val page = q.split("=").lastOption.map(_.toInt).getOrElse(-1)
      if (ex.getRequestHeaders.getFirst("Authorization") == "Bearer t0k3n")
        authedPages.incrementAndGet()
      pages.get(page) match {
        case Some(body) => respond(ex, 200, body)
        case None => respond(ex, 404, "")
      }
    })
    server.start()
    try f(s"http://localhost:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("reads one partition per page; from_json parse stays declarative") {
    val pages = Map(
      0 -> "{\"id\": 1}\n{\"id\": 2}\n",
      1 -> "{\"id\": 3}\n\n{\"id\": 4}", // blank line skipped
      2 -> "{\"id\": 5}")
    withServer(pages) { base =>
      val df = spark.read.format("graft-http-jsonl")
        .option("url", s"$base/items?page={page}")
        .option("pages", "3")
        .load()
      assert(df.rdd.getNumPartitions === 3)
      val rows = df
        .select(col("page"), col("line"),
          get_json_object(col("value"), "$.id").cast("long").as("id"))
        .orderBy("id").collect()
      assert(rows.map(_.getAs[Long]("id")).toSeq === Seq(1L, 2L, 3L, 4L, 5L))
      // per-page line numbering restarts
      assert(rows.map(r => (r.getAs[Int]("page"), r.getAs[Long]("line"))).toSet
        === Set((0, 0L), (0, 1L), (1, 0L), (1, 1L), (2, 0L)))
    }
  }

  test("column pruning reaches the reader; counts never read values") {
    withServer(Map(0 -> "{\"a\":1}\n{\"a\":2}")) { base =>
      val df = spark.read.format("graft-http-jsonl")
        .option("url", s"$base/items?page={page}")
        .load()
      assert(df.count() === 2L)
      val plan = df.select("page").queryExecution.executedPlan.toString
      assert(plan.contains("ReadSchema: struct<page:int>")
        || !plan.contains("value"), plan.take(800))
    }
  }

  test("static header options flow into every page request") {
    val pages = Map(0 -> "{}", 1 -> "{}")
    withServer(pages) { base =>
      val n = spark.read.format("graft-http-jsonl")
        .option("url", s"$base/items?page={page}")
        .option("pages", "2")
        .option("header.Authorization", "Bearer t0k3n")
        .load().count()
      assert(n === 2L)
    }
  }

  test("micro-batch stream: checkpointed incremental page consumption") {
    // mutable page horizon — the pagesUrl endpoint reports how many
    // pages exist right now, mirroring an API's count field
    val horizon = new java.util.concurrent.atomic.AtomicInteger(2)
    val server = HttpServer.create(new java.net.InetSocketAddress(0), 0)
    def respond(ex: HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes("UTF-8")
      ex.sendResponseHeaders(code, if (b.isEmpty) -1 else b.length)
      if (b.nonEmpty) ex.getResponseBody.write(b)
      ex.close()
    }
    server.createContext("/count", (ex: HttpExchange) =>
      respond(ex, 200, horizon.get.toString))
    server.createContext("/items", (ex: HttpExchange) => {
      val page = Option(ex.getRequestURI.getQuery).getOrElse("")
        .split("=").last.toInt
      if (page < horizon.get) respond(ex, 200, s"{\"p\": $page}")
      else respond(ex, 404, "")
    })
    server.start()
    val base = s"http://localhost:${server.getAddress.getPort}"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-http-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft-http-out").toString
    def drainOnce(): Seq[Int] = {
      val q = spark.readStream.format("graft-http-jsonl")
        .option("url", s"$base/items?page={page}")
        .option("pagesUrl", s"$base/count")
        .load()
        .select(get_json_object(col("value"), "$.p").cast("int").as("p"))
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      // bounded AvailableNow drain: block on processAllAvailable
      // (never a timed awaitTermination — the r14 foot-gun), then stop
      q.processAllAvailable()
      q.stop()
      q.awaitTermination(60000)
      spark.read.parquet(out).collect().map(_.getInt(0)).sorted.toSeq
    }
    try {
      assert(drainOnce() === Seq(0, 1))
      horizon.set(5) // three new pages appear upstream
      // same checkpoint ⇒ the second drain appends ONLY pages 2..4
      assert(drainOnce() === Seq(0, 1, 2, 3, 4))
    } finally server.stop(0)
  }

  test("missing page fails the task with a helpful error, not silence") {
    withServer(Map(0 -> "{}")) { base =>
      val e = intercept[Exception] {
        spark.read.format("graft-http-jsonl")
          .option("url", s"$base/items?page={page}")
          .option("pages", "2") // page 1 is a 404
          .load().count()
      }
      def msgs(t: Throwable): String =
        if (t == null) "" else t.getMessage + " " + msgs(t.getCause)
      assert(msgs(e).contains("404") || msgs(e).contains("failed"))
    }
  }
}
