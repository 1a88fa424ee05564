package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernel for the two token counts every cheap quality signal
  * starts from: `(n_tokens, n_distinct)` in ONE pass over the text bytes.
  *
  * The declarative formulation pays two full `split` materializations
  * (`size(split(text, " "))` + `size(array_distinct(split(text, " ")))`)
  * — two arrays of per-token UTF8Strings plus array_distinct's quadratic
  * small-array scan, per row. This kernel allocates nothing but segment
  * offsets and a hash set of zero-copy byte-slice wrappers.
  *
  * Token semantics mirror `TextOps.tokens` / DuckDB
  * `string_split(text, ' ')` exactly: split on the single space byte,
  * EMPTY SEGMENTS KEPT (0x20 never occurs inside a multi-byte UTF-8
  * sequence, so byte-level splitting is code-point-correct — same
  * contract as [[RepetitionStats]]). Distinctness is content equality of
  * the exact byte slices (ByteBuffer wrappers) — no hashing caveat.
  */
object TokenCounts {
  val Schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false)))

  def eval(text: UTF8String): InternalRow = {
    val bytes = text.getBytes
    val n = bytes.length
    var nSegs = 1
    var i = 0
    while (i < n) { if (bytes(i) == ' '.toByte) nSegs += 1; i += 1 }
    val seen = new java.util.HashSet[ByteBuffer]((nSegs * 2) | 8)
    var nDistinct = 0
    var start = 0
    i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' '.toByte) {
        if (seen.add(ByteBuffer.wrap(bytes, start, i - start))) nDistinct += 1
        start = i + 1
      }
      i += 1
    }
    InternalRow(nSegs, nDistinct)
  }
}

/** `graft_token_counts(text)` → `(n_tokens, n_distinct)` (codegen'd). */
case class TokenCountsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TokenCounts.Schema
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_token_counts"

  override def nullSafeEval(input: Any): Any =
    TokenCounts.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      c => s"${ev.value} = graft.functions.TokenCounts.eval($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
