package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.TestSpark
import graft.ops.{functions => F}

/** Property-based invariants (SURVEY.md §5.3). Each property evaluates
  * one Spark job over a generated batch (not one job per sample), and
  * the suite caps test counts to keep the run fast.
  */
object OpsPropertiesSpec extends Properties("graft.ops") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private val ipGen = Gen.listOfN(40, Gen.chooseNum(0L, 4294967295L))
  property("ipv4 int→string→int round-trips across the space") =
    Prop.forAll(ipGen) { vs =>
      vs.isEmpty || {
        val df = vs.toDF("v")
          .select(F.ipToInt(F.ipFromInt(col("v"))).as("rt"), col("v"))
        df.filter(col("rt") =!= col("v")).count() == 0L
      }
    }

  private val strGen = Gen.listOfN(30, Gen.alphaNumStr.map(_.take(20)))
  property("case functions are idempotent") =
    Prop.forAll(strGen) { ss =>
      ss.isEmpty || {
        val df = ss.toDF("s").select(
          (F.lowercase(F.lowercase(col("s"))) === F.lowercase(col("s"))).as("l"),
          (F.uppercase(F.uppercase(col("s"))) === F.uppercase(col("s"))).as("u"))
        df.filter(!col("l") || !col("u")).count() == 0L
      }
    }

  property("recastNull is idempotent and only maps '' to null") =
    Prop.forAll(Gen.listOfN(30, Gen.oneOf(Gen.const(""), Gen.alphaStr))) { ss =>
      ss.isEmpty || {
        val df = ss.toDF("s")
          .select(col("s"), F.recastNull(col("s")).as("o"),
            F.recastNull(F.recastNull(col("s"))).as("o2"))
        df.filter(col("o").isNull =!= (col("s") === "") ||
          !(col("o") <=> col("o2"))).count() == 0L
      }
    }

  private val arraysGen = Gen.listOfN(20,
    Gen.oneOf(
      Gen.const(null.asInstanceOf[Seq[String]]),
      Gen.listOf(Gen.alphaStr.map(_.take(5))).map(_.toSeq)))
  property("denormalize row count = Σ|non-empty| + #(empty or null)") =
    Prop.forAll(arraysGen) { arrays =>
      arrays.isEmpty || {
        val df = arrays.zipWithIndex.map { case (a, i) => (i, a) }.toDF("id", "xs")
        val expect = arrays.map(a =>
          if (a == null || a.isEmpty) 1L else a.size.toLong).sum
        F.denormalize(df, "xs").count() == expect
      }
    }

  property("camelToSnake is idempotent") =
    Prop.forAll(strGen) { ss =>
      ss.isEmpty || {
        val df = ss.toDF("s").select(
          (F.camelToSnake(F.camelToSnake(col("s"))) <=> F.camelToSnake(col("s"))).as("ok"))
        df.filter(!col("ok")).count() == 0L
      }
    }

  private val textGen = Gen.listOfN(10,
    Gen.listOfN(12, Gen.oneOf("spark", "batch", "merge", "row", "data", "the"))
      .map(_.mkString(" ")))
  property("jaccard(self)=1; jaccard bounded in [0,1]") =
    Prop.forAll(textGen) { ts =>
      ts.isEmpty || {
        val sh = graft.llm.Dedup.shingles(col("t"), 2)
        val df = ts.toDF("t").select(
          graft.llm.Dedup.jaccard(sh, sh).as("self"))
        df.filter(col("self") =!= 1.0).count() == 0L
      }
    }

  // pure-kernel properties (no Spark job): the full 128-bit IP space
  private val bigGen: Gen[BigInt] = for {
    bits <- Gen.chooseNum(1, 128)
    bytes <- Gen.listOfN((bits + 7) / 8, Gen.chooseNum(0, 255))
  } yield BigInt((0.toByte +: bytes.map(_.toByte)).toArray)
    .mod(BigInt(2).pow(128))
  property("ip format→parse round-trips the full 128-bit space") =
    Prop.forAll(Gen.listOfN(200, bigGen)) { vs =>
      vs.forall { v =>
        import graft.expressions.IpKernel
        val s = IpKernel.formatAddress(v.bigInteger)
        s != null && {
          val back = IpKernel.parseInterface(s)
          back != null && BigInt(back.value) == v &&
            // canonical form is a fixed point of format∘parse
            IpKernel.formatAddress(back.value) == s
        }
      }
    }

  // repetitionStats' sorted-run fold must equal the direct frequency
  // computation for any token multiset (skewed vocab to force runs)
  private val docGen: Gen[List[String]] = for {
    n <- Gen.chooseNum(1, 60)
    ws <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "dd", "e1", "zz"))
  } yield ws
  property("repetitionStats run-fold equals direct token frequencies") =
    Prop.forAll(Gen.listOfN(20, docGen)) { docsList =>
      docsList.isEmpty || {
        val rows = docsList.zipWithIndex.map { case (ws, i) =>
          (i.toLong, ws.mkString(" "))
        }
        val got = rows.toDF("id", "t")
          .select(col("id"),
            graft.llm.TextAnalysis.repetitionStats(col("t")).as("r"))
          .select(col("id"), col("r.n_tokens"), col("r.distinct_ratio"),
            col("r.top_token_frac"))
          .collect().map(r => r.getLong(0) ->
            (r.getInt(1), r.getDouble(2), r.getDouble(3))).toMap
        docsList.zipWithIndex.forall { case (ws, i) =>
          val n = ws.length
          val freq = ws.groupBy(identity).map(_._2.length)
          got(i.toLong) == ((n, freq.size.toDouble / n, freq.max.toDouble / n))
        }
      }
    }
}
