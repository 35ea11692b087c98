package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** md5 hex digest with a thread-local, reused MessageDigest.
  *
  * Spark's built-in `Md5` goes through commons-codec `DigestUtils`,
  * which calls `MessageDigest.getInstance("MD5")` for EVERY row —
  * a JCA provider lookup per value. The dedup pipelines hash millions of
  * shingles × 8 seeds, where that lookup dominates. Output is identical
  * lowercase hex (oracle parity with DuckDB `md5` is unchanged); the
  * expression participates in whole-stage codegen via a static call
  * (see [[org.apache.spark.sql.graftfn.FastMd5Expr]]).
  */
object FastMd5 {
  private val digest = ThreadLocal.withInitial(() =>
    java.security.MessageDigest.getInstance("MD5"))
  private val HexChars = "0123456789abcdef".toCharArray

  /** Static entry used from generated code. */
  def hexOf(input: Array[Byte]): UTF8String = {
    val md = digest.get()
    md.reset()
    val d = md.digest(input)
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HexChars(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Column API: md5 hex of a string/binary column. */
  def fastMd5(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftfn.GraftExpressions.fastMd5(c)
}
