package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused kernel for the portable 60-bit hash ([[PortableHash]]): md5 of the
  * UTF-8 bytes, then the first (or second) 15 hex digits read as an
  * integer — computed directly from the digest bytes. Bit-identical to the
  * declarative `conv(substring(md5(c), …, 15), 16, 10)` chain (spec-pinned,
  * `PortableHashSpec`), which allocates a 32-char hex string per value and
  * re-parses it; this kernel shifts the digest's first/second 8 bytes
  * instead. The hash itself is still md5 — the DuckDB oracles reproduce
  * every value unchanged.
  *
  * This is the engine's hottest scalar: every shingle, minhash seed,
  * simhash token, CMS/HLL/Bloom key, sampling draw, and k-means seed pays
  * it once per row (PERF.md "profile_approx is md5-bound").
  *
  * First 15 hex digits = the big-endian 64-bit integer of digest bytes
  * 0..7 shifted right 4 (hex digit 16, byte 7's low nibble, drops out);
  * digits 17..31 are the same formula over bytes 8..15.
  */
object Hash60 {
  private val md = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  def eval(s: UTF8String, second: Boolean): Long = {
    val d = md.get()
    d.reset()
    val bytes = d.digest(s.getBytes)
    val off = if (second) 8 else 0
    var v = 0L
    var i = 0
    while (i < 8) {
      v = (v << 8) | (bytes(off + i) & 0xffL)
      i += 1
    }
    v >>> 4
  }
}

/** `graft_hash60(text)` / second-chunk variant → long (codegen'd). */
case class Hash60Expr(child: Expression, second: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = if (second) "graft_hash60b" else "graft_hash60"

  override def nullSafeEval(input: Any): Any =
    Hash60.eval(input.asInstanceOf[UTF8String], second)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      c => s"${ev.value} = graft.functions.Hash60.eval($c, $second);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
