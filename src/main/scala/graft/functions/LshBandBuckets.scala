package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Deterministic pseudo-random hyperplanes for sign-bit LSH, shared by the
  * engine kernel and the DuckDB oracles: plane `p`'s component `i` is
  * `(hash60("h:p:i") mod 10^6)/10^6 − 0.5` — pure functions of the portable
  * md5 hash, so both engines rebuild bit-identical IEEE doubles.
  */
object LshPlanes {
  def planeInts(p: Int, dim: Int): Array[Long] =
    Array.tabulate(dim)(i => PortableHash.hash60Local(s"h:$p:$i") % 1000000L)

  def planeVector(p: Int, dim: Int): Array[Double] =
    planeInts(p, dim).map(k => k.toDouble / 1000000.0 - 0.5)
}

/** Native Catalyst expression: ALL banded sign-bit LSH bucket ids of an
  * `array<double>` embedding in one fused pass → `array<long>` of length
  * `bands`, where band `b`'s bucket bit `j` is the sign of the embedding's
  * projection onto plane `b·planesPerBand + j`.
  *
  * Why a kernel and not a `bands × planesPerBand`-term column expression:
  * at the dedup_embedding_lsh config (20 bands × 6 planes × 64 dims) the
  * composed expression tree carries 120 literal plane arrays — big enough
  * to fall out of whole-stage codegen and evaluate interpreted, measured
  * ~8 s for candidate generation at sf0.1 vs sub-second fused. Here the
  * plane matrix is ONE plan-time constant (rebuilt from `(bands·r, dim)`
  * via [[LshPlanes]], nothing but three ints in the plan) and the inner
  * loop is `bands·r` straight-line dot products per row.
  *
  * Determinism contract (same as [[graft.operators.SimilarityOps.lshBucket]]
  * and the oracle-green knn_lsh): each projection is a strictly
  * left-to-right dot, rounded like Spark's `round(x, 6)`
  * (`BigDecimal.valueOf` + HALF_UP — the identical arithmetic DuckDB's
  * `round` performs on these magnitudes), then sign-tested — so bucket
  * assignment is reproducible cross-engine. Null input → null.
  */
case class LshBandBucketsExpr(
    child: Expression,
    bands: Int,
    planesPerBand: Int,
    dim: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_lsh_band_buckets"

  @transient private lazy val mat: Array[Array[Double]] =
    Array.tabulate(bands * planesPerBand)(p => LshPlanes.planeVector(p, dim))

  override def nullSafeEval(input: Any): Any = {
    val emb = input.asInstanceOf[ArrayData]
    new GenericArrayData(LshBandBucketsExpr.compute(emb, mat, bands, planesPerBand))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("lshPlanes", mat, "double[][]")
    nullSafeCodeGen(
      ctx,
      ev,
      a => {
        val buckets = ctx.freshName("buckets")
        s"""
         |long[] $buckets = graft.functions.LshBandBucketsExpr.compute(
         |  $a, $matRef, $bands, $planesPerBand);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($buckets);
         """.stripMargin
      })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshBandBucketsExpr {
  /** Shared interpreted/codegen kernel (static so the generated code is a
    * one-line call — nothing to blow the JIT/janino method limits).
    */
  def compute(
      emb: ArrayData,
      mat: Array[Array[Double]],
      bands: Int,
      planesPerBand: Int): Array[Long] = {
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var bucket = 0L
      var j = 0
      while (j < planesPerBand) {
        val plane = mat(b * planesPerBand + j)
        val n = math.min(emb.numElements(), plane.length)
        var dot = 0.0
        var i = 0
        while (i < n) {
          dot += emb.getDouble(i) * plane(i)
          i += 1
        }
        // Spark round(x, 6) semantics — keep the sign test on the exact
        // same rounded value the column-expression form compares
        val rounded = java.math.BigDecimal.valueOf(dot)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        if (rounded > 0) bucket |= 1L << j
        j += 1
      }
      out(b) = bucket
      b += 1
    }
    out
  }
}
