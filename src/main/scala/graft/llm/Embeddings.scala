package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding-column utilities ([EXT]): normalization and quantization —
  * the storage/serving steps downstream of similarity search in a
  * training-data pipeline (a 100 TB embedding store at float32 is 4
  * bytes/dim; int8 quantization cuts it 4× with bounded error, and
  * L2-normalization turns cosine into dot product).
  *
  * All map-only Column/DataFrame plans, engine-portable semantics
  * (DuckDB list functions express the same arithmetic — q88), double
  * precision internally so float inputs widen exactly in any engine.
  */
object Embeddings {

  /** L2-normalize a float/double array column (null-safe; zero vector
    * stays zero). After this, `graft_dot` IS cosine similarity. */
  def l2Normalize(vec: Column): Column =
    // 1-element aggregate = let-binding (see Dedup.shingles): cast once,
    // then normalize. The norm subtree re-evaluates per element — O(d²)
    // adds inside codegen, fine for embedding-sized d; a UDF would not
    // codegen at all.
    aggregate(array(transform(vec, x => x.cast(DoubleType))),
      lit(null).cast(ArrayType(DoubleType)), (_, v) => {
        val norm = sqrt(aggregate(v, lit(0.0), (a, x) => a + x * x))
        transform(v, x => when(norm > 0, x / norm).otherwise(lit(0.0)))
      })

  /** Symmetric per-vector int8 quantization: scale = 127 / max|x|,
    * qval = clamp(round(x·scale), ±127). One row per element —
    * (id, idx, qval, scale_micro) with the scale in exact integer
    * micro-units so the output carries no raw doubles (hash-stable
    * across engines; q88's DuckDB oracle rebuilds it bit-for-bit).
    * Map-only: no shuffle before the caller's ordering. Zero/empty
    * vectors quantize to qval 0 at scale_micro 0. */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = transform(col(vecCol), x => x.cast(DoubleType))
    val maxabs = aggregate(v, lit(0.0), (a, x) => greatest(a, abs(x)))
    val scale = when(maxabs > 0, lit(127.0) / maxabs).otherwise(lit(0.0))
    df.select(col(idCol), scale.as("_scale"), v.as("_v"))
      .select(col(idCol),
        posexplode(transform(col("_v"), x =>
          least(lit(127.0), greatest(lit(-127.0), round(x * col("_scale"))))
            .cast(IntegerType))).as(Seq("idx", "qval")),
        round(col("_scale") * 1e6).cast(LongType).as("scale_micro"))
  }
}
