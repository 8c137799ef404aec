package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernel for the document-fingerprint hot loop (t04). The composed
  * form evaluates `aggregate(transform(split(text), md5-hash), rolling)`
  * through Spark's INTERPRETED higher-order array functions — one
  * expression-tree walk per word. This loop does the identical arithmetic
  * in one pass: per word, the md5-derived 60-bit
  * [[graft.queries.Portable.portableHash]] value (`conv(substring(
  * md5(w),1,15),16,10)` = the digest's top 60 bits) mod 1000, folded as
  * `acc*31 + h (mod 2^31-1)` in document order. Parity with the composed
  * form AND the DuckDB oracle is judged by t11 (the v06 pattern).
  */
object TextFunctions {

  // one digest instance per task thread: getInstance does a provider
  // lookup + allocation, far too heavy for a per-row call site (digest()
  // leaves the instance reset, so reuse is safe)
  private val localMd = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  def fingerprintWords(text: UTF8String): Long = {
    // limit -1 matches Spark's split(): trailing empty words are kept
    val words = text.toString.split(" ", -1)
    val md = localMd.get()
    var acc = 0L
    var i = 0
    while (i < words.length) {
      val d = md.digest(words(i).getBytes(StandardCharsets.UTF_8))
      // first 15 hex digits of the digest = top 60 bits of bytes 0..7
      var top = 0L
      var b = 0
      while (b < 8) { top = (top << 8) | (d(b) & 0xffL); b += 1 }
      val h = top >>> 4
      acc = (acc * 31 + h % 1000L) % 2147483647L
      i += 1
    }
    acc
  }
}

/** `fingerprint_words(string) -> long` as a codegen'd native expression. */
case class FingerprintWords(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "fingerprint_words"

  override protected def nullSafeEval(text: Any): Any =
    TextFunctions.fingerprintWords(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.TextFunctions.fingerprintWords($t)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
