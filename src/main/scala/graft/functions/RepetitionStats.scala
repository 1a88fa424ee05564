package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernel for the Gopher repetition signals (Rae et al. 2021
  * §A1.1): per document, the most-frequent-bigram count and the distinct
  * 5-gram count, in one pass over the text bytes.
  *
  * Token semantics mirror `TextOps.tokens` / DuckDB `string_split(text,
  * ' ')` exactly: split on the single space byte, EMPTY SEGMENTS KEPT
  * (0x20 never occurs inside a multi-byte UTF-8 sequence, so byte-level
  * splitting is code-point-correct). A word n-gram joined with spaces is
  * then literally the text's byte slice spanning n consecutive segments —
  * the kernel counts distinct slices via content-equality ByteBuffer
  * wrappers (zero-copy, EXACT strings, no hash-collision caveat) instead
  * of materializing per-gram strings the way the HOF + explode + double
  * group-by formulation did. No explode, no shuffle, no persist barrier —
  * the whole operator becomes a narrow per-row map (the declarative
  * formulation shuffled one row per bigram occurrence: ~2 rows per token
  * of pure exchange traffic that this kernel never emits).
  *
  * Output struct: `(n_tokens, n_bigrams, top_bigram_n, n_5grams,
  * n_distinct_5)`; n-gram fields are 0 when the doc is shorter than the
  * gram (the oracle's CASE arms).
  */
object RepetitionStats {
  val Schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("top_bigram_n", LongType, nullable = false),
    StructField("n_5grams", IntegerType, nullable = false),
    StructField("n_distinct_5", IntegerType, nullable = false)))

  def eval(text: UTF8String): InternalRow = {
    val bytes = text.getBytes
    val n = bytes.length
    // segment boundaries: starts(i) .. ends(i) is token i (exclusive end)
    var nSegs = 1
    var i = 0
    while (i < n) { if (bytes(i) == ' '.toByte) nSegs += 1; i += 1 }
    val starts = new Array[Int](nSegs)
    val ends = new Array[Int](nSegs)
    var seg = 0
    starts(0) = 0
    i = 0
    while (i < n) {
      if (bytes(i) == ' '.toByte) {
        ends(seg) = i
        seg += 1
        starts(seg) = i + 1
      }
      i += 1
    }
    ends(seg) = n

    var topBigram = 0L
    var nBigrams = 0L
    if (nSegs >= 2) {
      nBigrams = nSegs - 1L
      val counts = new java.util.HashMap[ByteBuffer, Array[Int]]((nSegs * 2) | 8)
      i = 0
      while (i < nSegs - 1) {
        val k = ByteBuffer.wrap(bytes, starts(i), ends(i + 1) - starts(i))
        val c = counts.get(k)
        if (c == null) counts.put(k, Array(1))
        else c(0) += 1
        i += 1
      }
      val it = counts.values().iterator()
      while (it.hasNext) {
        val c = it.next()(0)
        if (c > topBigram) topBigram = c.toLong
      }
    }

    var n5 = 0
    var nDistinct5 = 0
    if (nSegs >= 5) {
      n5 = nSegs - 4
      val seen = new java.util.HashSet[ByteBuffer]((n5 * 2) | 8)
      i = 0
      while (i < n5) {
        if (seen.add(ByteBuffer.wrap(bytes, starts(i), ends(i + 4) - starts(i))))
          nDistinct5 += 1
        i += 1
      }
    }
    InternalRow(nSegs, nBigrams, topBigram, n5, nDistinct5)
  }
}

/** `graft_repetition(text)` → the per-doc repetition-stat struct. */
case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RepetitionStats.Schema
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_repetition"

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      c => s"${ev.value} = graft.functions.RepetitionStats.eval($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
