package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Registration + Column-facing wrappers for graft's native expressions.
  *
  * Spark 4's public `Column` wraps a `ColumnNode`, so custom Catalyst
  * expressions are exposed the supported way: registered in the session's
  * `FunctionRegistry` and invoked via `call_function` — this keeps the
  * expression inside whole-stage codegen with zero wrapper overhead.
  */
object GraftFunctions {

  val COSINE = "graft_cosine"
  val DOT = "graft_dot"

  /** Idempotent per-session registration (called from SparkEntry.tune) —
    * skips names already present so repeated tune() calls (one per query
    * in Verify/Bench) don't spam "function replaced" warnings.
    */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    def registerOnce(name: String, builder: Seq[org.apache.spark.sql.catalyst.expressions.Expression] => org.apache.spark.sql.catalyst.expressions.Expression): Unit =
      if (!registry.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        registry.createOrReplaceTempFunction(name, builder, "scala_udf")
    registerOnce(COSINE, exprs => CosineSimilarity(exprs(0), exprs(1)))
    registerOnce(DOT, exprs => DotProduct(exprs(0), exprs(1)))
  }

  /** Cosine similarity over two `array<double>` columns (codegen'd). */
  def cosine(a: Column, b: Column): Column = call_function(COSINE, a, b)

  /** Dot product over two `array<double>` columns (codegen'd). */
  def dot(a: Column, b: Column): Column = call_function(DOT, a, b)

  /** Reference implementation with built-in higher-order functions —
    * interpreted, kept for cross-checking the native expression in tests
    * and as the no-custom-code fallback.
    */
  def cosineHof(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }
}
