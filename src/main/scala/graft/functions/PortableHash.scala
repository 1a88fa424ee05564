package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic 60-bit hash, used wherever a hashed value
  * (minhash component, simhash token hash, LSH bucket seed, media checksum)
  * must be reproducible by the DuckDB oracle.
  *
  * Definition: the first 15 hex chars of `md5(input)` read as a base-16
  * integer — 60 bits, always non-negative, exact in int64 on both engines.
  * `hash60b` reads chars 17..31 of the same digest: a second independent
  * 60-bit value per md5 evaluation (halves digest work when several hashes
  * per key are needed, e.g. minhash seed pairs).
  *
  * md5 is bit-identical everywhere; the hex→int polynomial uses only
  * exact integer arithmetic (max value 16^15−1 < 2^60), so no overflow and
  * no engine-specific rounding anywhere. This is the same portability
  * pattern as the winnowing base-257 polynomial (TextOps.winnowFingerprints)
  * that keeps `doc_winnow` oracle-green.
  *
  * Production note: a non-oracled deployment would swap this for xxhash64
  * (one 64-bit mix vs an md5); the call sites take any `Column => Column`
  * shape, so the swap is mechanical.
  */
object PortableHash {

  /** First 60 bits of md5 as a long (Spark side) — the fused native kernel
    * ([[Hash60Expr]]); values identical to the declarative chain below.
    */
  def hash60(c: Column): Column =
    call_function(GraftFunctions.HASH60, c.cast("string"))

  /** Second independent 60-bit chunk (hex chars 17..31) of the same digest. */
  def hash60b(c: Column): Column =
    call_function(GraftFunctions.HASH60B, c.cast("string"))

  /** Declarative twins over an already-computed 32-char hex digest column —
    * also the spec cross-check for the native kernel (`PortableHashSpec`).
    */
  def digest60(d: Column): Column =
    conv(substring(d, 1, 15), 16, 10).cast("long")
  def digest60b(d: Column): Column =
    conv(substring(d, 17, 15), 16, 10).cast("long")

  /** Driver-side twin (plane/seed generation at plan-build time). */
  def hash60Local(s: String): Long = {
    val d = java.security.MessageDigest
      .getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** DuckDB SQL for the same value over a precomputed digest expression:
    * DuckDB has no `conv()`, so spell the base-16 polynomial explicitly
    * (15 exact-integer terms; 16^14 = 2^56 is exact).
    */
  def digestPolySql(digestExpr: String, offset: Int): String = {
    val terms = (0 until 15).map { j =>
      val pow = 1L << (4 * (14 - j)) // 16^(14-j)
      s"CAST((strpos('0123456789abcdef', substr($digestExpr, ${offset + j}, 1)) - 1) AS BIGINT) * $pow"
    }
    terms.mkString("(", " + ", ")")
  }

  /** DuckDB SQL for `hash60(inner)` / `hash60b(inner)` (inner: VARCHAR). */
  def hash60Sql(inner: String): String = digestPolySql(s"md5($inner)", 1)
  def hash60bSql(inner: String): String = digestPolySql(s"md5($inner)", 17)
}
