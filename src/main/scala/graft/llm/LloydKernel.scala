package graft.llm

/** In-process Lloyd k-means for coarse-quantizer training over a
  * BOUNDED sample (see [[Similarity.topKIvf]]): the sample is O(nlist)
  * rows collected to the driver, so training runs in microseconds with
  * zero cluster jobs. Deterministic: initial centroids are the first k
  * DISTINCT sample points in sample order (the sample itself is
  * hash-spread, i.e. already shuffled deterministically), and ties in
  * assignment break toward the lower cell index.
  */
object LloydKernel {

  /** Returns `min(k, distinct points)` centroids — duplicates in the
    * sample are skipped at seeding, so no two initial centroids
    * coincide (coincident seeds would shadow each other forever: the
    * lower-indexed one wins every assignment and the other stays an
    * empty cell). Empty cells keep their previous centroid (standard
    * Lloyd practice — a cell that captured no points this round is
    * left where it was).
    *
    * `farthestSeeding = true` switches seeding from first-k-distinct
    * to deterministic farthest-point (Gonzalez): seed 0 is the first
    * point, each next seed the point with the LARGEST min-distance to
    * the chosen seeds (strict >, so ties break to the lower index).
    * With separated clusters this lands one seed per cluster —
    * first-k-distinct can put two seeds in one cluster and starve
    * another, a local minimum Lloyd never escapes. Used by the PQ
    * production codebook; the IVF coarse trainer keeps the original
    * seeding (its centroids feed rows-only probes, and changing them
    * silently would reshuffle every persisted cell assignment). */
  def fit(points: Array[Array[Double]], k: Int, maxIter: Int,
      farthestSeeding: Boolean = false): Array[Array[Double]] = {
    require(k >= 1, "k must be >= 1")
    if (points.isEmpty) return Array.empty
    val dim = points(0).length
    val seeds = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    if (farthestSeeding) {
      def d2(a: Array[Double], b: Array[Double]): Double = {
        var acc = 0.0; var j = 0
        while (j < dim) { val t = a(j) - b(j); acc += t * t; j += 1 }
        acc
      }
      seeds += points(0).clone()
      val minD = points.map(d2(_, points(0)))
      while (seeds.length < k && minD.exists(_ > 0.0)) {
        var best = 0; var bestD = 0.0
        var i = 0
        while (i < points.length) {
          if (minD(i) > bestD) { bestD = minD(i); best = i }
          i += 1
        }
        val s = points(best)
        seeds += s.clone()
        var i2 = 0
        while (i2 < points.length) {
          val nd = d2(points(i2), s)
          if (nd < minD(i2)) minD(i2) = nd
          i2 += 1
        }
      }
    } else {
      val seen = scala.collection.mutable.HashSet.empty[Seq[Double]]
      var si = 0
      while (si < points.length && seeds.length < k) {
        val p = points(si)
        if (seen.add(p.toSeq)) seeds += p.clone()
        si += 1
      }
    }
    val kk = seeds.length
    var centroids = seeds.toArray

    def nearest(p: Array[Double]): Int = {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < kk) {
        var d = 0.0
        var j = 0
        val cc = centroids(c)
        while (j < dim) { val t = p(j) - cc(j); d += t * t; j += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }

    var iter = 0
    while (iter < maxIter) {
      val sums = Array.ofDim[Double](kk, dim)
      val counts = new Array[Long](kk)
      points.foreach { p =>
        val c = nearest(p)
        counts(c) += 1
        var j = 0
        while (j < dim) { sums(c)(j) += p(j); j += 1 }
      }
      centroids = Array.tabulate(kk) { c =>
        if (counts(c) == 0) centroids(c) // empty cell: keep previous
        else {
          val m = sums(c)
          var j = 0
          while (j < dim) { m(j) /= counts(c); j += 1 }
          m
        }
      }
      iter += 1
    }
    centroids
  }
}
