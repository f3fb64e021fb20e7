package graft.llm

/** Dev harness (test scope, no spark): per-language score breakdown
  * for each q99 fixture sentence — `Test/runMain graft.llm.LangIdDebug`
  * prints the top-4 scoring languages per fixture so close-pair
  * interference (da/nb vs nl/sv, id/ms, …) can be tuned by data.
  */
object LangIdDebug {
  def main(args: Array[String]): Unit = {
    import graft.expressions.LangIdKernel._
    graft.queries.R6Queries.LangFixtures
      .zip(graft.queries.R6Queries.LangFixtureLangs)
      .foreach { case (t, want) =>
        val s = t.toLowerCase(java.util.Locale.ROOT)
        val sc = new Array[Long](langs.length)
        for (i <- 0 until s.length - 2) {
          val w = weights.get(s.substring(i, i + 3))
          if (w != null) for (j <- w.indices) sc(j) += w(j)
        }
        val top = langs.zip(sc).filter(_._2 > 0).sortBy(-_._2).take(4)
        val got = if (top.isEmpty) "und" else top.head._1
        val mark = if (got == want) "ok  " else "MISS"
        println(f"$mark want=$want%-3s ${top.map { case (l, v) => s"$l=$v" }
          .mkString(" ")}")
      }
  }
}
