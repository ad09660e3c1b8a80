package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit md5-derived string hash as a codegen-capable expression.
  *
  * Semantically identical to `conv(substring(md5(c), 1, 15), 16, 10)`
  * (and to DuckDB's `('0x' || substr(md5(x),1,15))::BIGINT`): the first
  * 15 hex characters of an md5 digest are the top 60 bits of its first
  * 8 bytes. The built-in route materializes a 32-char hex string plus a
  * substring and a base-conversion PER ROW — this expression goes
  * digest-bytes -> long directly, which matters when the input is
  * per-shingle/per-token rows (millions per document batch in the
  * MinHash/SimHash paths).
  */
object Md5Hex64Math {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def hashBytes(bytes: Array[Byte]): Long = hashBytes(bytes, 0, bytes.length)

  /** Range overload: hash `len` bytes at `off` with no slice copy —
    * the per-position CDC probe loop calls this once per corpus
    * character.
    */
  def hashBytes(bytes: Array[Byte], off: Int, len: Int): Long = {
    val d = md.get()
    d.reset()
    d.update(bytes, off, len)
    val dig = d.digest()
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    v >>> 4
  }

  def hashUtf8(s: UTF8String): Long = hashBytes(s.getBytes)
}

case class Md5Hex64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_md5_hex64"

  override def nullSafeEval(input: Any): Any =
    Md5Hex64Math.hashUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = Md5Hex64Math.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$m.hashUtf8($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Hex64 =
    copy(child = newChild)
}

object Md5Hex64Fn {
  def apply(c: Column): Column = exprToColumn(Md5Hex64(columnToExpr(c.cast("string"))))
}
