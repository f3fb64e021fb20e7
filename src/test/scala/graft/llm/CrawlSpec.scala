package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSuite

class CrawlSpec extends SparkSuite {
  import spark.implicits._

  private val rules = Seq(
    ("a.com", false, "/private/"),
    ("a.com", true, "/private/open"),
    ("b.com", false, "/"),
    ("b.com", true, "/pub/"),
    ("c.com", true, "/x"),
    ("c.com", false, "/x")
  ).toDF("host", "allow", "prefix")

  private val urls = Seq(
    (1L, "a.com", "/private/secret"),   // deny: /private/
    (2L, "a.com", "/private/open/f"),   // allow: longer prefix overrides
    (3L, "a.com", "/index"),            // no matching rule -> allow
    (4L, "b.com", "/anything"),         // deny-all
    (5L, "b.com", "/pub/doc"),          // allow subtree under deny-all
    (6L, "c.com", "/x/y"),              // length tie -> allow wins
    (7L, "d.com", "/whatever")          // host with no rules -> allow
  ).toDF("id", "host", "path")

  test("robotsFilter: longest match, tie->allow, default allow") {
    val r = Crawl.robotsFilter(urls, "id", "host", "path", rules)
      .collect().map(x => x.getLong(0) ->
        ((x.getBoolean(3), Option(x.getString(4))))).toMap
    assert(r(1L) === ((false, Some("/private/"))))
    assert(r(2L) === ((true, Some("/private/open"))))
    assert(r(3L) === ((true, None)))
    assert(r(4L) === ((false, Some("/"))))
    assert(r(5L) === ((true, Some("/pub/"))))
    assert(r(6L) === ((true, Some("/x"))))
    assert(r(7L) === ((true, None)))
  }

  test("robotsFilter: shuffle-join tier agrees with the broadcast tier") {
    val a = Crawl.robotsFilter(urls, "id", "host", "path", rules)
      .orderBy("id").collect().toSeq
    val b = Crawl.robotsFilter(urls, "id", "host", "path", rules,
      broadcastRules = false).orderBy("id").collect().toSeq
    assert(a === b)
  }

  test("extractLinks: resolution, ordering, linkless pages absent") {
    val df = Seq(
      (1L, """<a href="/a">x</a><a href="https://e.org/p">y</a>""" +
        """<a href="#f">z</a><a href="mailto:m@n">m</a>""" +
        """<a href="//cdn.e.org/c">c</a><a href="../rel">r</a>""", "h.com"),
      (2L, "no links here", "h.com")
    ).toDF("id", "html", "host")
    val r = Crawl.extractLinks(df, "id", "html", "host").collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getString(2))).toSeq
    assert(r === Seq(
      (1L, 0, "https://h.com/a"),
      (1L, 1, "https://e.org/p")))
  }

  test("pageRankInt: exact integer ranks, hand-computed 2 iterations") {
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    // outdeg 1:2, 2:1, 3:1; base = 150000
    // iter1: cs 1←1e6, 2←5e5, 3←1.5e6 ⇒ r1 = (1e6, 575000, 1425000)
    // iter2: cs 1←1425000, 2←500000, 3←1075000
    //        ⇒ r2 = (1361250, 575000, 1063750)
    val r = Crawl.pageRankInt(e, iters = 2).collect()
      .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    assert(r === Seq((1L, 1361250L), (2L, 575000L), (3L, 1063750L)))
  }

  test("pageRankInt: dangling mass dropped, sink still gets base + in") {
    val e = Seq((1L, 2L)).toDF("src", "dst") // node 2 dangles
    val r = Crawl.pageRankInt(e, iters = 1).collect()
      .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    // r1: node1 = base (no in-edges); node2 = base + 85*1e6/100
    assert(r === Seq((1L, 150000L), (2L, 1000000L)))
  }
}
