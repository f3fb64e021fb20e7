package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `graft_pq_encode(vec)` → array<int>: product-quantization encode
  * one double vector against a trained codebook — the hot map-only
  * kernel of the PQ compression path (`Similarity.pqEncode`).
  *
  * BIT-IDENTICAL to the relational formulation it replaces (the
  * array_min-over-(dist, code)-structs HOF): per slot the squared-L2
  * to each centroid accumulates sequentially over ascending j in
  * doubles, and the argmin scans codes ascending with a strict `<`
  * — so equal distances keep the LOWER code, exactly the
  * lexicographic struct-min / the oracle's ORDER BY dd, code. The
  * HOF form allocated ncent structs and boxed every element per
  * slot per row; this is three fused primitive loops.
  *
  * Scale shape: the codebook rides inside the expression
  * (parameter-bounded: nsub·ncent·dsub doubles — the BpeEncode/
  * langid convention), so the encode is map-only with no join, no
  * broadcast variable, and no shuffle. Codegen'd via reference
  * object, same as [[DotProduct]].
  */
case class PqEncodeExpr(child: Expression, codebook: Array[Double],
    nsub: Int, ncent: Int, dsub: Int) extends UnaryExpression {

  require(codebook.length == nsub * ncent * dsub,
    s"codebook length ${codebook.length} != nsub*ncent*dsub " +
      s"(${nsub * ncent * dsub})")

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  override def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[ArrayData])

  def compute(v: ArrayData): ArrayData = {
    val out = new Array[Int](nsub)
    var s = 0
    while (s < nsub) {
      val base = s * dsub
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < ncent) {
        val cb = (s * ncent + c) * dsub
        var d = 0.0
        var j = 0
        while (j < dsub) {
          val diff = v.getDouble(base + j) - codebook(cb + j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = c } // tie keeps the lower code
        c += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftPqEncode", this,
      classOf[PqEncodeExpr].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): PqEncodeExpr = copy(child = newChild)
}

/** `graft_pq_adc(codes, lut)` → bigint: asymmetric-distance sum for
  * one PQ-coded candidate against one query's (slot-major) integer
  * micro-unit lookup table — Σ_s lut[s·ncent + codes[s]]. The inner
  * loop of the compressed-domain scan ([[graft.llm.Similarity
  * .pqAdcTopK]]): the HOF `aggregate(sequence(...))` form boxed both
  * arrays per candidate per query; this is nsub primitive lookups.
  * Integer addition is order-free, so the sum is trivially
  * engine-exact. */
case class PqAdcExpr(left: Expression, right: Expression, ncent: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_pq_adc"

  override def nullSafeEval(codes: Any, lut: Any): Any =
    compute(codes.asInstanceOf[ArrayData], lut.asInstanceOf[ArrayData])

  def compute(codes: ArrayData, lut: ArrayData): Long = {
    val n = codes.numElements()
    var acc = 0L
    var s = 0
    while (s < n) {
      acc += lut.getLong(s * ncent + codes.getInt(s))
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftPqAdc", this,
      classOf[PqAdcExpr].getName)
    nullSafeCodeGen(ctx, ev,
      (c, l) => s"${ev.value} = $ref.compute($c, $l);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcExpr =
    copy(left = newLeft, right = newRight)
}

/** `graft_cell_assign(vec)` → int: coarse-quantizer cell assignment —
  * argmin over `nlist` centroids of exact squared-L2, ties to the
  * LOWER cell. The production-tier corpus kernel of the IVF
  * compositions ([[graft.llm.Similarity.topKIvfAdc]],
  * [[graft.llm.Dedup.semanticDedup]]): the relational form (array of
  * per-cell distance structs + array_min) is an interpreted HOF whose
  * ONE expensive input (the float→double cast transform) gets
  * CollapseProject-inlined into every per-cell branch — measured at
  * 1M×64d, nlist=64: the HOF form ran the cast 64× per row (~13 s for
  * the corpus pass); this kernel reads the vector once and runs
  * nlist·dim fused primitive ops (the [[PqEncodeExpr]] shape, one
  * level up). The SAMPLED oracle tier keeps the relational fold — its
  * nested sequential sums are what DuckDB replays. Centroids ride
  * inside the expression (parameter-bounded: nlist·dim doubles). */
case class CellAssignExpr(child: Expression, cents: Array[Double],
    nlist: Int, dim: Int) extends UnaryExpression {

  require(cents.length == nlist * dim,
    s"centroid table length ${cents.length} != nlist*dim " +
      s"(${nlist * dim})")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_cell_assign"

  override def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[ArrayData])

  def compute(v: ArrayData): Int = {
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < nlist) {
      val base = c * dim
      var d = 0.0
      var j = 0
      while (j < dim) {
        val diff = v.getDouble(j) - cents(base + j)
        d += diff * diff
        j += 1
      }
      if (d < bestD) { bestD = d; best = c } // tie keeps the lower cell
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftCellAssign", this,
      classOf[CellAssignExpr].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): CellAssignExpr = copy(child = newChild)
}

/** `graft_cell_assign2(vec)` → int: TWO-LEVEL (hierarchical) coarse
  * cell assignment — argmin over `nSuper` super-centroids, then
  * argmin over ONLY the winning super-cell's sub-centroids; both
  * levels exact squared-L2 with ties to the lower index, both fused
  * into one kernel reading the vector once. The returned id is
  * GLOBAL: `subOffsets(s) + bestSub`, where `subOffsets` (length
  * nSuper+1) slices the concatenated `subCents` table per super-cell
  * and doubles as the global-id base (so `subOffsets(nSuper)` is the
  * total cell count).
  *
  * This is the scale fix for the flat quantizer's n·nlist·dim
  * assignment wall (SCALE.md r13: nlist tracks n at constant cell
  * size, so flat assignment is quadratic in n — semanticDedup 65 s
  * @1M → 3416 s @10M): per row this kernel does
  * nSuper·dim + subCount(s)·dim ≈ 2√nlist·dim work. The trade is the
  * standard hierarchical-quantizer approximation (FAISS IMI lineage):
  * the nearest GLOBAL cell can live under a super-cell the first
  * level didn't pick, so assignments near super-cell boundaries may
  * differ from the flat argmin — verdict-equivalence for
  * [[graft.llm.Dedup.semanticDedup]] is spec-pinned on planted
  * clusters, where co-located duplicates land together under ANY
  * centroid set. Centroid tables ride inside the expression
  * (parameter-bounded: ~(√nlist + nlist)·dim doubles). */
case class CellAssign2Expr(child: Expression, superCents: Array[Double],
    nSuper: Int, subCents: Array[Double], subOffsets: Array[Int],
    dim: Int) extends UnaryExpression {

  require(superCents.length == nSuper * dim,
    s"super-centroid table length ${superCents.length} != nSuper*dim " +
      s"(${nSuper * dim})")
  require(subOffsets.length == nSuper + 1 && subOffsets(0) == 0 &&
    subOffsets(nSuper) * dim == subCents.length,
    s"subOffsets must have ${nSuper + 1} entries from 0 to " +
      s"subCents.length/dim (${subCents.length / dim})")
  // every super-cell needs ≥1 sub-centroid: an empty slice would make
  // the second argmin return the NEXT super's first global id
  require((0 until nSuper).forall(s => subOffsets(s + 1) > subOffsets(s)),
    "every super-cell must own at least one sub-centroid (the trainer " +
      "seeds empty super-cells with the super-centroid itself)")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_cell_assign2"

  override def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[ArrayData])

  def compute(v: ArrayData): Int = {
    var bestS = 0
    var bestD = Double.PositiveInfinity
    var s = 0
    while (s < nSuper) {
      val base = s * dim
      var d = 0.0
      var j = 0
      while (j < dim) {
        val diff = v.getDouble(j) - superCents(base + j)
        d += diff * diff
        j += 1
      }
      if (d < bestD) { bestD = d; bestS = s } // tie keeps the lower super
      s += 1
    }
    val lo = subOffsets(bestS)
    val hi = subOffsets(bestS + 1)
    var bestC = lo
    bestD = Double.PositiveInfinity
    var c = lo
    while (c < hi) {
      val base = c * dim
      var d = 0.0
      var j = 0
      while (j < dim) {
        val diff = v.getDouble(j) - subCents(base + j)
        d += diff * diff
        j += 1
      }
      if (d < bestD) { bestD = d; bestC = c } // tie keeps the lower cell
      c += 1
    }
    bestC
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftCellAssign2", this,
      classOf[CellAssign2Expr].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): CellAssign2Expr = copy(child = newChild)
}
