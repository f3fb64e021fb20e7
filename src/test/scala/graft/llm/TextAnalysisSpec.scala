package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSuite

class TextAnalysisSpec extends SparkSuite {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, input: String): T =
    Seq(input).toDF("t").select(c).collect()(0).getAs[T](0)

  test("token counts: whitespace and BPE-ish") {
    assert(one[Int](TextAnalysis.tokenCountWs(col("t")), "a  b\tc") === 3)
    // "don't stop!" → [don]['][t][stop][!]
    assert(one[Int](TextAnalysis.tokenCountBpeish(col("t")), "don't stop!") === 5)
    assert(one[Int](TextAnalysis.tokenCountBpeish(col("t")), "abc123") === 2)
  }

  test("stopword and punct ratios") {
    assert(one[Double](TextAnalysis.stopwordRatio(col("t"), Seq("the", "a")),
      "the cat in a hat") === 0.4)
    assert(one[Double](TextAnalysis.punctRatio(col("t")), "ab!!") === 0.5)
  }

  test("qualityScore rewards prose, penalizes symbol noise") {
    val prose = one[Double](TextAnalysis.qualityScore(col("t")),
      "the engine reads a parquet file and writes the result to disk")
    val noise = one[Double](TextAnalysis.qualityScore(col("t")),
      "@@@@ #### $$$$ %%%% ^^^^ &&&&")
    assert(prose > noise)
    assert(prose > 0.5)
  }

  test("langIdHeuristic identifies stopword profiles; garbage → und") {
    assert(one[String](TextAnalysis.langIdHeuristic(col("t")),
      "the cat sat on the mat and it is warm") === "en")
    assert(one[String](TextAnalysis.langIdHeuristic(col("t")),
      "el gato y la casa de los vecinos en un pueblo") === "es")
    assert(one[String](TextAnalysis.langIdHeuristic(col("t")),
      "der Hund und die Katze ist von den Bäumen") === "de")
    assert(one[String](TextAnalysis.langIdHeuristic(col("t")),
      "le chat est dans la maison et les jardins") === "fr")
    assert(one[String](TextAnalysis.langIdHeuristic(col("t")),
      "zxqwv bnmpo qqq kjhgf") === "und")
  }

  test("fingerprint: stable, equal for equal text, shift-tolerant prefix") {
    val a = one[String](TextAnalysis.fingerprint(col("t"), 5),
      "one two three four five six seven eight")
    val b = one[String](TextAnalysis.fingerprint(col("t"), 5),
      "one two three four five six seven eight")
    assert(a === b && a.length === 64)
    // appending content can only lower (or keep) the min-hash
    val c = one[String](TextAnalysis.fingerprint(col("t"), 5),
      "one two three four five six seven eight nine ten")
    assert(c <= a)
  }

  test("piiScrub: redacts emails/ipv4/phones with counts; order fixed; no false hits") {
    def scrub(t: String): (String, Int, Int, Int) = {
      val r = Seq(t).toDF("t")
        .select(TextAnalysis.piiScrub(col("t")).as("p"))
        .select("p.clean_text", "p.n_emails", "p.n_ipv4", "p.n_phones")
        .collect()(0)
      (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3))
    }
    assert(scrub("mail a.b+c@ex-1.org now") ===
      (("mail <EMAIL> now", 1, 0, 0)))
    assert(scrub("host 10.0.0.1 and 192.168.255.3") ===
      (("host <IP> and <IP>", 0, 2, 0)))
    assert(scrub("call +4915112345678 or 555-123-4567") ===
      (("call <PHONE> or <PHONE>", 0, 0, 2)))
    // a version string is not an IP (only 3 octets), a year is not a
    // phone, a bare @ is not an email
    assert(scrub("v1.2.3 built 2024 by dev @ home") ===
      (("v1.2.3 built 2024 by dev @ home", 0, 0, 0)))
    // an IP-shaped domain is no email (the TLD must be alphabetic),
    // but it IS an IP — and counts run against the ORIGINAL text
    assert(scrub("x@1.2.3.4 ping") === (("x@<IP> ping", 0, 1, 0)))
  }

  test("vocabCoverage: exact micro-unit curve, rank cut, tie order") {
    val df = Seq("b b b a a c", "a d").toDF("text")
    // counts: a=3, b=3, c=1, d=1, total=8 → ranks by (cnt desc, term)
    val r = TrainingOps_vocabCoverage(df)
    assert(r === Seq(
      (1, "a", 3L, 3L, 375000L),   // 3/8
      (2, "b", 3L, 6L, 750000L),   // 6/8
      (3, "c", 1L, 7L, 875000L)))  // size=3 cuts d
  }

  private def TrainingOps_vocabCoverage(df: org.apache.spark.sql.DataFrame) =
    graft.llm.TrainingOps.vocabCoverage(df, "text", size = 3)
      .orderBy("rank").collect()
      .map(x => (x.getInt(0), x.getString(1), x.getLong(2), x.getLong(3),
        x.getLong(4))).toSeq

  test("dupNgramStats: hand vectors — runs, ties, singles, empties") {
    def stats(t: String, n: Int): (Int, Int, String, Long, Long) = {
      val r = Seq(t).toDF("t")
        .select(TextAnalysis.dupNgramStats(col("t"), n).as("r"))
        .select("r.n_ngrams", "r.top_cnt", "r.top_gram", "r.top_chars",
          "r.dup_chars").collect()(0)
      (r.getInt(0), r.getInt(1), r.getString(2), r.getLong(3), r.getLong(4))
    }
    // two tied 2-grams: lexicographically smallest wins the top slot,
    // both contribute to dup_chars
    assert(stats("a b a b a", 2) === ((4, 2, "a b", 6L, 12L)))
    // all unique: first gram is top with cnt 1, nothing duplicated
    assert(stats("x y z", 2) === ((2, 1, "x y", 3L, 0L)))
    // exactly one gram
    assert(stats("a b", 2) === ((1, 1, "a b", 3L, 0L)))
    // shorter than one gram / empty → zero row with null gram
    assert(stats("w", 2) === ((0, 0, null, 0L, 0L)))
    assert(stats("", 2) === ((0, 0, null, 0L, 0L)))
    // n=1 degenerates to token stats
    assert(stats("t t t t", 1) === ((4, 4, "t", 4L, 4L)))
    // a longer run beats an earlier shorter one
    assert(stats("b c b c a a a b c", 2) === ((8, 3, "b c", 9L, 15L)))
  }

  test("repetitionStats: run-fold equals token frequency max; edge cases") {
    def stats(t: String): (Int, Double, Double) = {
      val r = Seq(t).toDF("t")
        .select(TextAnalysis.repetitionStats(col("t")).as("r"))
        .select("r.n_tokens", "r.distinct_ratio", "r.top_token_frac")
        .collect()(0)
      (r.getInt(0), r.getDouble(1), r.getDouble(2))
    }
    // "spam" 3 of 6 tokens — top fraction 0.5, distinct 4/6
    assert(stats("spam a spam b spam c") === ((6, 4.0 / 6, 0.5)))
    // all distinct
    assert(stats("a b c d") === ((4, 1.0, 0.25)))
    // all identical
    assert(stats("x x x") === ((3, 1.0 / 3, 1.0)))
    // single token (the sequence-fold guard path)
    assert(stats("only") === ((1, 1.0, 1.0)))
    // runs must count in SORTED order, not input order: interleaved
    // "a b a b a" has max run 1 in input order but frequency 3
    assert(stats("a b a b a")._3 === 0.6)
  }

  test("scrubPii replaces every email and card occurrence, leaves text") {
    def scrub(t: String): String =
      Seq(t).toDF("t").select(TextAnalysis.scrubPii(col("t")))
        .collect()(0).getString(0)
    assert(scrub("mail a.user+tag@sub.example.org now") === "mail <EMAIL> now")
    assert(scrub("card 4111-1111-1111-1234.") === "card <CARD>.")
    assert(scrub("raw 4111111111111234 ok") === "raw <CARD> ok")
    assert(scrub("x@y.io and z@w.co!") === "<EMAIL> and <EMAIL>!")
    assert(scrub("no pii here 1234-56") === "no pii here 1234-56")
  }

  test("stripHtml: tags gone, entities decoded once, whitespace collapsed") {
    def strip(t: String): String =
      Seq(t).toDF("t").select(TextAnalysis.stripHtml(col("t")))
        .collect()(0).getString(0)
    assert(strip("<p>hello <b>world</b></p>") === "hello world")
    assert(strip("a &lt;tag&gt; &amp; &quot;q&quot; &#39;s&#39;")
      === "a <tag> & \"q\" 's'")
    // single decode only: "&amp;lt;" is the ESCAPED text "&lt;" —
    // must not double-decode to "<"
    assert(strip("x &amp;lt; y") === "x &lt; y")
    assert(strip("  <div>\n  spaced\tout  </div>  ") === "spaced out")
    assert(strip("<a href=\"u\">link</a>text") === "link text")
  }

  test("nfc: composes decomposed sequences, identity on normalized text") {
    def nfc(t: String): String =
      Seq(t).toDF("t").select(TextAnalysis.nfc(col("t")))
        .collect()(0).getString(0)
    assert(nfc("café") === "café") // e + combining acute → é
    assert(nfc("café") === "café") // already NFC: unchanged
    assert(nfc("Å") === "Å") // A + ring → Å
    assert(nfc("plain ascii 123") === "plain ascii 123")
    // null propagates
    val r = Seq(Option.empty[String]).toDF("t")
      .select(TextAnalysis.nfc(col("t"))).collect()(0)
    assert(r.isNullAt(0))
  }

  test("unigramLogProb: exact micropoint sums, OOV floor, vocab cutoff") {
    // vocab limit 2 keeps {"the" (4), "cat" (2)}; "dog"/"sat" are OOV
    val docs = Seq(
      (1L, "the cat the cat"),     // all in-vocab
      (2L, "the dog sat"),         // two OOV tokens
      (3L, "the")).toDF("id", "text")
    val out = TextAnalysis.unigramLogProb(docs, "id", "text", vocabSize = 2)
      .orderBy("doc_id").collect()
    val total = 8.0 // tokens overall
    def micro(p: Double) = math.round(math.log(p) * 1e6)
    val theM = micro(4 / total); val catM = micro(2 / total)
    val oovM = micro(0.5 / total)
    assert(out(0).getAs[Long]("n_tokens") === 4L)
    assert(out(0).getAs[Long]("sum_logprob_micro") === 2 * theM + 2 * catM)
    assert(out(1).getAs[Long]("sum_logprob_micro") === theM + 2 * oovM)
    assert(out(2).getAs[Long]("sum_logprob_micro") === theM)
    // avg = sum / 1e6 / n rounded to 4 — exact integer inputs
    assert(out(2).getAs[Double]("avg_logprob")
      === BigDecimal(theM / 1e6).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // the corpus-frequent doc scores higher than the OOV-heavy one
    assert(out(0).getAs[Double]("avg_logprob") > out(1).getAs[Double]("avg_logprob"))
  }

  test("qualityGate: integer-exact thresholds, first-failed-rule reason") {
    import spark.implicits._
    def doc(words: Seq[String]) = words.mkString(" ")
    // 5-char filler tokens keep chars/token inside the [5,6] band so
    // only the intended rule fires in each case
    def w(i: Int) = f"wo$i%03d"
    val good = doc(Seq.tabulate(40)(i => if (i % 10 == 0) "the" else w(i)))
    val tiny = "the cat"                                  // < 30 tokens
    val repeated = doc(Seq.fill(10)("the") ++ Seq.tabulate(30)(w))
    val noStops = doc(Seq.tabulate(40)(w))
    val out = Seq((1L, good), (2L, tiny), (3L, repeated), (4L, noStops))
      .toDF("id", "text")
      .select($"id", TextAnalysis.qualityGate($"text").as("g"))
      .select($"id", $"g.keep", $"g.reject_reason")
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getString(2)))).toMap
    assert(out(1L) === ((true, "ok")))
    assert(out(2L) === ((false, "tokens")))   // rule order: tokens first
    assert(out(3L) === ((false, "repetition")))
    assert(out(4L) === ((false, "stopwords")))
  }

  test("qualityGate: default word-len band is the whitespace-adjusted Gopher 3-10 rule") {
    import spark.implicits._
    // mean word length 2 (below Gopher's 3): chars = 2n + n-1 = 3n-1 < 4n
    val short2 = (Seq.fill(15)("ab") ++ Seq.fill(15)("of")).mkString(" ")
    // mean word length 12 (above Gopher's 10): chars = 13n-1 > 11n
    val long12 = Seq.tabulate(30)(i => f"abcdefghi$i%03d").mkString(" ")
    // mean word length ~5 with stopwords at exactly the 10% top-token
    // cap: inside [4n, 11n], passes every other rule too
    val mid = (0 until 30).map(i => if (i % 10 == 0) "the" else f"tok$i%02d")
      .mkString(" ")
    val out = Seq((1L, short2), (2L, long12), (3L, mid)).toDF("id", "text")
      .select($"id", TextAnalysis.qualityGate($"text").as("g"))
      .select($"id", $"g.keep", $"g.reject_reason")
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getString(2)))).toMap
    assert(out(1L) === ((false, "word_len")))
    assert(out(2L) === ((false, "word_len")))
    assert(out(3L) === ((true, "ok")))
  }

  test("langId: trigram model labels each fixture language; und fallback") {
    import graft.expressions.LangIdKernel
    // per-language vectors: all 40 fixture sentences, 1:1 with the
    // declared label list (the same pairing q99 cycles by doc key)
    assert(graft.queries.R6Queries.LangFixtures.size ===
      graft.queries.R6Queries.LangFixtureLangs.size)
    assert(graft.queries.R6Queries.LangFixtures.size === 40)
    graft.queries.R6Queries.LangFixtures
      .zip(graft.queries.R6Queries.LangFixtureLangs)
      .foreach { case (t, l) =>
        val (got, score) = LangIdKernel.classify(t)
        assert(got === l, s"'$t' → $got (want $l)")
        assert(score > 0)
      }
    assert(LangIdKernel.classify("zzz qqq 12345")._1 === "und")
    assert(LangIdKernel.classify("")._1 === "und")
    // uppercase input folds before scoring
    assert(LangIdKernel.classify(
      "THE QUICK BROWN FOX AND THE LAZY DOG WITH YOU")._1 === "en")
    // Column path: struct(lang, score); null text → null struct
    import spark.implicits._
    val out = Seq(Some("och det är en dag som är för alla"), None)
      .toDF("t")
      .select(TextAnalysis.langId($"t").as("l"))
      .select($"l.lang", $"l.score").collect()
    assert(out(0).getString(0) === "sv" && out(0).getLong(1) > 0)
    assert(out(1).isNullAt(0) && out(1).isNullAt(1))
  }

  test("urlParts: host/registrable-domain/path canonicalization") {
    import spark.implicits._
    val cases = Seq(
      ("https://www.News.Example.CO.UK/world/42?utm_source=x",
        ("news.example.co.uk", "example.co.uk", "/world/42")),
      ("http://sub.a.example.com:8080/p/q#frag",
        ("sub.a.example.com", "example.com", "/p/q")),
      ("https://user:pw@example.org/x",
        ("example.org", "example.org", "/x")),
      ("ftp://www.example.com.au/f",
        ("example.com.au", "example.com.au", "/f")),
      ("https://localhost/admin", ("localhost", "localhost", "/admin")),
      ("https://example.com", ("example.com", "example.com", "")),
      ("not a url at all", ("", "", "")),
      // bundled-PSL tiers: ccTLD second levels the old 15-entry table
      // missed, and 3-label suffixes (longest match wins)
      ("https://shop.store.example.com.sg/item",
        ("shop.store.example.com.sg", "example.com.sg", "/item")),
      ("http://www.portal.example.co.kr/a",
        ("portal.example.co.kr", "example.co.kr", "/a")),
      ("https://news.example.com.tr/x", ("news.example.com.tr",
        "example.com.tr", "/x")),
      ("https://sitio.example.com.ar/y", ("sitio.example.com.ar",
        "example.com.ar", "/y")),
      ("https://www.district.k12.ca.us/school",
        ("district.k12.ca.us", "district.k12.ca.us", "/school")),
      ("https://transport.act.gov.au/buses",
        ("transport.act.gov.au", "transport.act.gov.au", "/buses")),
      // ca.us is itself a 2-label suffix: sacramento.ca.us registrable
      ("https://www.sacramento.ca.us/", ("sacramento.ca.us",
        "sacramento.ca.us", "/")),
      // PSL wildcard *.ck: any 2nd-level label is a public suffix, so
      // shop.biz.ck is the registrable domain of its own subtree
      ("https://www.shop.biz.ck/item", ("shop.biz.ck", "shop.biz.ck", "/item")),
      ("https://deep.shop.biz.ck/x", ("deep.shop.biz.ck", "shop.biz.ck", "/x")),
      // host that EQUALS the wildcard public suffix: no registrable
      // domain -> passes through (same degenerate rule as literals)
      ("https://biz.ck/", ("biz.ck", "biz.ck", "/")),
      // PSL exception !www.ck: www.ck IS registrable despite *.ck
      ("https://b.www.ck/e", ("b.www.ck", "www.ck", "/e")),
      // *.np wildcard beats the literal com.np tie harmlessly (same
      // label count -> same registrable domain either way)
      ("https://www.site.com.np/p", ("site.com.np", "site.com.np", "/p")))
    assert(TextAnalysis.MultiLabelSuffixes.size > 400)
    val out = cases.map(_._1).toDF("url")
      .select(TextAnalysis.urlParts($"url").as("u"))
      .select("u.host", "u.domain", "u.path")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(out.toSeq === cases.map(_._2))
  }

  test("mainContent: keeps prose, drops nav / short / link-dense blocks") {
    val prose = "this is a long enough paragraph of real article prose"
    val page =
      """<nav><a href="/">home</a> <a href="/x">about us page</a></nav>""" +
      s"<div><p>$prose</p><p>short</p>" +
      """<div class="share"><a href="/s">share this page right now</a></div>""" +
      s"<p>$prose again</p></div>"
    val got = Seq(page).toDF("h")
      .select(TextAnalysis.mainContent(col("h")))
      .collect()(0).getString(0)
    assert(got === s"$prose\n$prose again")
    // link density is relative: a long block with ONE small link stays
    val mixed = s"<p>$prose <a href=\"/r\">ref</a></p>"
    val got2 = Seq(mixed).toDF("h")
      .select(TextAnalysis.mainContent(col("h")))
      .collect()(0).getString(0)
    assert(got2 === s"$prose ref")
    // pure-boilerplate page yields the empty string, not null
    val got3 = Seq("""<nav><a href="/">home</a></nav>""").toDF("h")
      .select(TextAnalysis.mainContent(col("h")))
      .collect()(0).getString(0)
    assert(got3 === "")
    // NULL page propagates NULL (oracle array_to_string semantics),
    // distinct from the empty-but-present page above
    val got4 = Seq(Option.empty[String]).toDF("h")
      .select(TextAnalysis.mainContent(col("h")))
      .collect()(0)
    assert(got4.isNullAt(0))
  }

  test("mainContent: script/style/noscript bodies never reach clean text") {
    val prose = "this is a long enough paragraph of real article prose"
    // the JS body is long, link-free prose-shaped text — it PASSES the
    // (length, link-density) gates, so only span removal keeps it out
    val js = "var analyticsTracker = 1; function recordPageView(x) " +
      "{ return x + 42; } window.onload = recordPageView;"
    val css = ".main { color: red; font-size: 12px; margin: 0 auto; }"
    val page =
      s"""<SCRIPT type="text/javascript">$js</SCRIPT>""" +
      s"<style>$css</style><noscript>enable javascript to view</noscript>" +
      s"<!-- rendered at request time --><p>$prose</p>"
    val got = Seq(page).toDF("h")
      .select(TextAnalysis.mainContent(col("h")))
      .collect()(0).getString(0)
    assert(got === prose)
    assert(!got.contains("analyticsTracker") && !got.contains("color"))
    // multi-line script spans drop too ((?s) dotall)
    val multi = s"<script>\nvar a = 1;\nvar b = 2;\n</script><p>$prose</p>"
    val got2 = Seq(multi).toDF("h")
      .select(TextAnalysis.mainContent(col("h")))
      .collect()(0).getString(0)
    assert(got2 === prose)
    // an UNCLOSED script has no bounding close marker: its content
    // survives (documented limit — not silently half-removed)
    val unclosed = s"<script>var x = 99;<p>$prose</p>"
    val got3 = Seq(unclosed).toDF("h")
      .select(TextAnalysis.mainContent(col("h")))
      .collect()(0).getString(0)
    assert(got3.contains(prose))
  }

  test("compressionRatio: repetitive < prose < random; deterministic") {
    val rnd = new scala.util.Random(42)
    val repetitive = "spam ham " * 200
    val prose = ("the quick brown fox jumps over the lazy dog while " +
      "seventeen researchers compare compression ratios ") * 10
    val random = (1 to 1600).map(_ => rnd.nextPrintableChar()).mkString
    val rows = Seq((1L, repetitive), (2L, prose), (3L, random))
      .toDF("id", "t")
      .select(col("id"), TextAnalysis.compressionRatio(col("t")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows(1L) < rows(2L) && rows(2L) < rows(3L), rows.toString)
    assert(rows(1L) < 0.1 && rows(3L) > 0.5, rows.toString)
    // same session, same inputs, same answer (ThreadLocal reuse must
    // not leak state across rows)
    val again = Seq((1L, repetitive), (2L, prose), (3L, random))
      .toDF("id", "t").repartition(3)
      .select(col("id"), TextAnalysis.compressionRatio(col("t")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(again === rows)
    // empty text: no meaningful ratio (0 bytes) -> NULL, pinned so
    // gates must decide empties explicitly
    val empty = Seq((1L, "")).toDF("id", "t")
      .select(TextAnalysis.compressionRatio(col("t"))).collect()(0)
    assert(empty.isNullAt(0))
  }

  test("naiveBayesScore: hand-computed Laplace log-odds in micro-units") {
    // vocab V=4, N1=4, N0=4, priors ln(2/2)=0
    //   w(good) = ln(4/8)-ln(1/8) = ln4  -> 1386294 micro
    //   w(nice) = ln(2/8)-ln(1/8) = ln2  ->  693147
    //   w(bad)  = -ln4, w(ugly) = -ln2
    val d = Seq(
      (1L, true, "good good"), (2L, true, "good nice"),
      (3L, false, "bad bad"), (4L, false, "bad ugly")
    ).toDF("id", "y", "text")
    val r = TextAnalysis.naiveBayesScore(d, "id", "text", "y")
      .orderBy("doc_id").collect()
    assert(r.map(_.getAs[Long]("score_micro")).toSeq ===
      Seq(2772588L, 2079441L, -2772588L, -2079441L))
    assert(r.map(_.getAs[Boolean]("predicted")).toSeq ===
      Seq(true, true, false, false))
    assert(r.map(_.getAs[Long]("n_tokens")).toSeq === Seq(2L, 2L, 2L, 2L))
  }

  test("naiveBayesScore: non-zero prior shifts every score; empty class raises") {
    // 2 positive docs, 1 negative -> prior = ln 2 = 693147 micro; the
    // shared token "x" has w(x) = ln((2+1)/(2+1)) - ln((1+1)/(1+1)) = 0,
    // so each score IS the prior
    val d = Seq((1L, true, "x"), (2L, true, "x"), (3L, false, "x"))
      .toDF("id", "y", "text")
    val r = TextAnalysis.naiveBayesScore(d, "id", "text", "y")
      .orderBy("doc_id").collect()
    assert(r.map(_.getAs[Long]("score_micro")).toSeq ===
      Seq(693147L, 693147L, 693147L))
    val oneClass = Seq((1L, true, "a b"), (2L, true, "c")).toDF("id", "y", "text")
    val e = intercept[Exception] {
      TextAnalysis.naiveBayesScore(oneClass, "id", "text", "y").collect()
    }
    assert(e.getMessage.contains("class is empty"), e.getMessage)
  }

  test("bigramLogProb: hand-computed Laplace bigram micro-units") {
    // V=3 (a, b, and doc 3's x all count toward the vocabulary):
    //   lp(a,b) = ln((1+1)/(1+3)) = ln 0.5 -> -693147 micro
    //   lp(b,a) = ln((2+1)/(2+3)) = ln 0.6 -> -510826
    val d = Seq((1L, "a b a"), (2L, "b a"), (3L, "x"))
      .toDF("id", "text")
    val r = TextAnalysis.bigramLogProb(d, "id", "text")
      .orderBy("doc_id").collect()
    // single-token doc 3 has no bigram evidence -> excluded
    assert(r.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L, 2L))
    assert(r(0).getAs[Long]("n_bigrams") === 2L)
    assert(r(0).getAs[Long]("sum_logprob_micro") === -693147L - 510826L)
    assert(r(1).getAs[Long]("sum_logprob_micro") === -510826L)
  }

  test("perplexityBuckets: exact ntile split sizes and monotone bands") {
    // 7 docs, 3 buckets -> sizes 3,2,2 (n=7: q=2, m=1)
    val texts = Seq(
      "a a a a a a", "a a a a a b", "a a a a b b", "a a a b b b",
      "a a b b b b", "a b b b b b", "b b b b b b")
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val r = TextAnalysis.perplexityBuckets(d, "id", "text", nBuckets = 3)
      .collect()
    val byBucket = r.groupBy(_.getAs[Int]("bucket")).view
      .mapValues(_.length).toMap
    assert(byBucket === Map(1 -> 3, 2 -> 2, 3 -> 2), byBucket.toString)
    // bands are monotone in avg logprob: every head doc scores >= every
    // middle doc, every middle >= every tail
    def avgs(b: Int) = r.filter(_.getAs[Int]("bucket") == b)
      .map(x => x.getAs[Long]("sum_logprob_micro").toDouble /
        x.getAs[Long]("n_bigrams"))
    assert(avgs(1).min >= avgs(2).max && avgs(2).min >= avgs(3).max)
  }

  test("blocklistFilter: token-exact, case-folded, no substring blocking") {
    val d = Seq(
      (1L, "clean prose only here"),
      (2L, "some BAD and more bad stuff"),
      // substring must NOT block: badge contains 'bad' but isn't it
      (3L, "wearing a badge proudly"),
      (4L, "ugly bad things")
    ).toDF("id", "text")
    val r = TextAnalysis.blocklistFilter(d, "id", "text",
        Seq("bad", "ugly"))
      .orderBy("doc_id").collect()
    assert(r.map(_.getAs[Boolean]("kept")).toSeq ===
      Seq(true, false, true, false))
    assert(r(1).getAs[Long]("n_blocked_tokens") === 2L) // BAD + bad
    assert(r(1).getAs[String]("blocked_terms") === "bad")
    assert(r(3).getAs[String]("blocked_terms") === "bad,ugly")
    assert(r(0).getAs[String]("blocked_terms") === "")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.blocklistFilter(d, "id", "text", Seq("Bad"))
    }
    assert(e.getMessage.contains("lowercase"), e.getMessage)
  }

  test("mojibake: count detects artifacts, zero on clean scripts, round-trip") {
    def cnt(s: String): Long =
      one[Int](TextAnalysis.mojibakeCount(col("t")).cast("int"), s).toLong
    assert(cnt("caffÃ© and â€™") === 2L)
    assert(cnt("plain ascii text") === 0L)
    // clean non-Latin scripts never false-positive
    assert(cnt("дети играют в саду") === 0L)
    assert(cnt("孩子们在花园里玩耍") === 0L)
    assert(cnt("الاطفال يلعبون") === 0L)
    // corrupt every repairable char the cp1252 way, then repair: identity
    val clean = TextAnalysis.MojibakeTable.map(_._2).mkString(" ") +
      " und der caffé gehört très tôt"
    val corrupted = TextAnalysis.MojibakeTable.foldLeft(clean) {
      case (acc, (bad, good)) => acc.replace(good, bad)
    }
    assert(corrupted !== clean)
    val repaired = one[String](
      TextAnalysis.mojibakeRepair(col("t")), corrupted)
    assert(repaired === clean)
    assert(one[Int](TextAnalysis.mojibakeCount(col("t")).cast("int"),
      corrupted) > 0)
  }

  test("scriptRatios: per-class counts, tie order, other fallback") {
    def r(s: String) =
      Seq(s).toDF("t").select(TextAnalysis.scriptRatios(col("t")).as("r"))
        .select("r.*").collect()(0)
    val mixed = r("hello мир 中文 مرحبا")
    assert(mixed.getAs[Long]("n_latin") === 5L)
    assert(mixed.getAs[Long]("n_cyrillic") === 3L)
    assert(mixed.getAs[Long]("n_cjk") === 2L)
    assert(mixed.getAs[Long]("n_arabic") === 5L)
    // latin/arabic tie at 5 → listed order wins
    assert(mixed.getAs[String]("script") === "latin")
    assert(r("дети дома").getAs[String]("script") === "cyrillic")
    assert(r("こども가나다").getAs[String]("script") === "cjk")
    // × ÷ sit inside the Latin-1 block but are NOT letters
    val sym = r("×÷ 123")
    assert(sym.getAs[Long]("n_latin") === 0L)
    assert(sym.getAs[String]("script") === "other")
    // Thai is outside all four classes: report other, never a guess
    assert(r("เด็กเล่น").getAs[String]("script") === "other")
  }
  test("phraseHits: non-overlapping replace-count semantics per phrase") {
    import spark.implicits._
    val df = Seq(
      (1L, "a table scan then a table scan again"),
      (2L, "tabletable scan"),        // substring still matches once
      (3L, "aaaa"),                    // self-overlap: "aa" counts 2, not 3
      (4L, "nothing here"),
      (5L, "")
    ).toDF("id", "text")
    val two = TextAnalysis.phraseHits(col("text"),
      Seq("table scan", "aa"))
    val got = df.select(col("id"), two.as("h")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got(1L) === 2)
    assert(got(2L) === 1)
    assert(got(3L) === 2) // left-to-right skip: aa|aa
    assert(got(4L) === 0)
    assert(got(5L) === 0)
    // null text -> null
    val n = Seq((1L, Option.empty[String])).toDF("id", "text")
      .select(TextAnalysis.phraseHits(col("text"), Seq("x")).as("h"))
      .collect()(0)
    assert(n.isNullAt(0))
    // SQL registration with a foldable array literal
    graft.expressions.NativeFunctions.register(spark)
    df.createOrReplaceTempView("ph_docs")
    val viaSql = spark.sql(
      "SELECT id, graft_phrase_hits(text, array('table scan', 'aa')) " +
      "AS h FROM ph_docs").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaSql === got)
    intercept[IllegalArgumentException] {
      TextAnalysis.phraseHits(col("text"), Seq("ok", ""))
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.phraseHits(col("text"), Seq("dup", "dup"))
    }
    // a NULL element inside the foldable array must raise the clear
    // graft_phrase_hits message, not an NPE from the builder's map
    val npe = intercept[Exception] {
      spark.sql("SELECT graft_phrase_hits(text, array('a', NULL)) " +
        "FROM ph_docs").collect()
    }
    assert(npe.getMessage.contains("graft_phrase_hits"),
      s"got: ${npe.getMessage}")
  }
  test("foldConfusables + canonicalizeUrlParams vectors") {
    import spark.implicits._
    val folded = Seq(
      "\u2018a\u2019 \u201cb\u201d \u2013 \u2014 \u2026 \ufb01sh \ufb02y\u00a0end"
    ).toDF("t").select(TextAnalysis.foldConfusables(col("t")))
      .collect()(0).getString(0)
    assert(folded === "'a' \"b\" - - ... fish fly end")
    // idempotent on already-clean ASCII
    val clean = Seq("plain 'quoted' \"text\" - ... fi").toDF("t")
      .select(TextAnalysis.foldConfusables(col("t"))).collect()(0).getString(0)
    assert(clean === "plain 'quoted' \"text\" - ... fi")

    val urls = Seq(
      "https://a.com/p?b=2&a=1&utm_source=x&fbclid=z#f", // sort + drop
      "https://a.com/p?a=1&b=2",                          // already canonical
      "https://a.com/p?utm_campaign=only",                // all dropped
      "https://a.com/p",                                  // no query
      "https://a.com/p#frag"                              // fragment only
    ).toDF("u")
    val got = urls.select(col("u"),
      TextAnalysis.canonicalizeUrlParams(col("u")).as("c")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("https://a.com/p?b=2&a=1&utm_source=x&fbclid=z#f")
      === "https://a.com/p?a=1&b=2")
    assert(got("https://a.com/p?a=1&b=2") === "https://a.com/p?a=1&b=2")
    assert(got("https://a.com/p?utm_campaign=only") === "https://a.com/p")
    assert(got("https://a.com/p") === "https://a.com/p")
    assert(got("https://a.com/p#frag") === "https://a.com/p")
  }

  test("kneserNeyBigram: sums to 1 per history; continuation counts rank fresh continuations") {
    // "francisco": frequent (10) but ONE history; "cat": rarer (4)
    // but FOUR histories. KN's continuation counts must rank cat
    // above francisco as an UNSEEN continuation — the signature
    // behavior raw-frequency backoff gets wrong.
    val docs = (Seq.fill(10)("san francisco") ++
      Seq("the cat", "a cat", "my cat", "one cat") ++
      Seq("zz qq")).toDF("text")
    // probeTopK = whole vocab (10 types) → the probe grid closes over
    // every continuation, so Σ_w P(w|u) must be 1 up to floor loss
    val out = TextAnalysis.kneserNeyBigram(docs, "text", probeTopK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val byU = out.groupBy(_._1._1)
    byU.foreach { case (u, rows) =>
      val total = rows.values.map(_._2).sum
      assert(total <= 1000000L && total >= 1000000L - rows.size,
        s"sum for $u = $total")
    }
    // unseen continuations of "zz": cat (4 histories) beats
    // francisco (1 history) despite francisco's 2.5× raw frequency
    assert(out(("zz", "cat"))._1 === 0L)
    assert(out(("zz", "francisco"))._1 === 0L)
    assert(out(("zz", "cat"))._2 > out(("zz", "francisco"))._2)
    // seen mass dominates: P(francisco|san) ≈ 1 (only continuation)
    assert(out(("san", "francisco"))._2 > 900000L)
  }

  test("pmiPairs: exclusive collocation tops the ranking with the exact ratio") {
    // 30×"aa bb" (exclusive collocation) + 40×"xx yy zz" (background)
    // window 2 ⇒ N = 30·2 + 40·6 = 300 ordered pairs
    val docs = (Seq.fill(30)("aa bb") ++ Seq.fill(40)("xx yy zz"))
      .toDF("text").repartition(4)
    val out = TextAnalysis.pmiPairs(docs, "text", window = 2,
        minCount = 5, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // hand-exact: ratio(aa,bb) = 30·300/(30·30) = 10.000000
    assert(out(("aa", "bb")) === ((30L, 10000000L)))
    assert(out(("bb", "aa")) === ((30L, 10000000L)))
    // background: ratio(xx,yy) = 40·300/(80·80) = 1.875000
    assert(out(("xx", "yy")) === ((40L, 1875000L)))
    // the exclusive pair outranks every background pair
    val top = TextAnalysis.pmiPairs(docs, "text", window = 2,
        minCount = 5, topK = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(top === Set(("aa", "bb"), ("bb", "aa")))
  }

  test("licenseFamily: first rule wins, case-insensitive, null -> unknown") {
    import spark.implicits._
    val r = Seq(
      ("a", "This work is LICENSED UNDER THE APACHE LICENSE v2"),
      // contains BOTH mit and gpl markers: rule ORDER decides
      ("b", "permission is hereby granted, free of charge ... " +
        "GNU General Public License"),
      ("c", "released under the gnu general public license"),
      ("d", "no license text at all"),
      ("e", null))
      .toDF("id", "t")
      .select(col("id"), TextAnalysis.licenseFamily(col("t")).as("f"))
      .collect().map(x => x.getString(0) -> x.getString(1)).toMap
    assert(r === Map("a" -> "apache-2.0", "b" -> "mit", "c" -> "gpl",
      "d" -> "unknown", "e" -> "unknown"))
  }

  test("lcpLen: exact prefix length over edge cases") {
    import spark.implicits._
    val rows = Seq(
      ("abcdef", "abcxyz", 3),   // mismatch mid-string
      ("same", "same", 4),       // identical
      ("", "anything", 0),       // empty side
      ("a", "b", 0),             // disjoint from char 1
      ("prefix", "prefixlonger", 6)) // one is a prefix of the other
      .toDF("a", "b", "k")
    val bad = rows.select(
        TextAnalysis.lcpLen(col("a"), col("b")).as("got"), col("k"))
      .collect().filter(r => r.getInt(0) != r.getInt(1))
    assert(bad.isEmpty, bad.mkString(", "))
  }

  test("groupBoilerplate: group LCP = LCP(min, max); planted chrome found") {
    import spark.implicits._
    val docs = Seq(
      ("s1", "NAV s1 | alpha content"),
      ("s1", "NAV s1 | beta content"),
      ("s1", "NAV s1 | zeta body"),
      ("s2", "solo document"),    // singleton: LCP is the whole text
      ("s3", "xx aaa"), ("s3", "yy bbb")) // nothing shared
      .toDF("source", "text").repartition(3)
    val out = TextAnalysis.groupBoilerplate(docs, "source", "text")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out("s1") === ((3L, 9L, "NAV s1 | ")))
    assert(out("s2") === ((1L, 13L, "solo document")))
    assert(out("s3") === ((2L, 0L, "")))
  }

  test("piiRedact: emails, IPv4s, phones redact in order; counts match; clean text untouched") {
    val docs = Seq(
      (1L, "write to a.b+c@sub.ex.org or ops@ex.io from 192.168.0.7 call +44 207-9460000"),
      (2L, "no pii here at all, just words and 42 numbers"),
      (3L, "two mails x@y.zz and w@v.qq same ip 10.0.0.1 and 10.0.0.1"),
      // version strings are NOT IPv4 (only three octets) and a
      // 4-octet-LOOKING token inside a word boundary stays caught
      (4L, "v1.2.3 is a version but 1.2.3.4 is an address"))
      .toDF("id", "text").repartition(2)
    val out = TextAnalysis.piiRedact(docs, "id", "text").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out(1L) === ((2L, 1L, 1L,
      "write to <EMAIL> or <EMAIL> from <IP> call <PHONE>")))
    assert(out(2L) === ((0L, 0L, 0L,
      "no pii here at all, just words and 42 numbers")))
    assert(out(3L) === ((2L, 2L, 0L,
      "two mails <EMAIL> and <EMAIL> same ip <IP> and <IP>")))
    assert(out(4L) === ((0L, 1L, 0L,
      "v1.2.3 is a version but <IP> is an address")))
  }
}
