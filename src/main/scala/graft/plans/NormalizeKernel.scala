package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** One-pass text normalization / tokenization, bit-identical to the
  * declarative pipeline
  * `trim(regexp_replace(regexp_replace(lower(c),"[^a-z0-9 ]"," ")," +"," "))`
  * (+ `split(_, " ")` for tokens):
  *
  *  - ASCII strings (the overwhelming case) run a single char loop —
  *    lowercase, map non-[a-z0-9 ] to space, collapse runs, trim —
  *    instead of five string passes with intermediate allocations.
  *  - Strings with any non-ASCII byte fall back to the EXACT JVM calls
  *    the Spark expressions make: String.toLowerCase() (what
  *    UTF8String.toLowerCase delegates to off the ASCII path),
  *    java.util.regex replaceAll with the same patterns, space-only
  *    trim (UTF8String.trim semantics), Pattern(" ").split(s, -1).
  *
  * NormalizeTokensSpec pins equality against the declarative forms on
  * edge strings and on the real documents corpus.
  */
object NormalizeImpl {
  private val nonAlnum = java.util.regex.Pattern.compile("[^a-z0-9 ]")
  private val spaces = java.util.regex.Pattern.compile(" +")
  private val space = java.util.regex.Pattern.compile(" ")

  def normalize(s: String): String = {
    var ascii = true
    var i = 0
    val n = s.length
    while (ascii && i < n) { if (s.charAt(i) >= 128) ascii = false; i += 1 }
    if (!ascii) {
      val lowered = s.toLowerCase()
      val cleaned = spaces.matcher(nonAlnum.matcher(lowered).replaceAll(" ")).replaceAll(" ")
      // space-only trim (UTF8String.trim), NOT String.trim (strips all <= 0x20)
      var b = 0
      var e = cleaned.length
      while (b < e && cleaned.charAt(b) == ' ') b += 1
      while (e > b && cleaned.charAt(e - 1) == ' ') e -= 1
      return cleaned.substring(b, e)
    }
    val sb = new java.lang.StringBuilder(n)
    var lastSpace = true // suppresses leading spaces + collapses runs
    i = 0
    while (i < n) {
      var c = s.charAt(i)
      if (c >= 'A' && c <= 'Z') c = (c + 32).toChar
      val keep = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (keep) { sb.append(c); lastSpace = false }
      else if (!lastSpace) { sb.append(' '); lastSpace = true }
      i += 1
    }
    // drop a single trailing space (runs were already collapsed)
    val len = sb.length
    if (len > 0 && sb.charAt(len - 1) == ' ') sb.setLength(len - 1)
    sb.toString
  }

  /** split(normalized, " ") with Spark's limit -1 semantics: the empty
    * string yields one empty token.
    */
  def tokens(s: String): Array[String] = {
    val norm = normalize(s)
    if (norm.isEmpty) Array("")
    else space.split(norm, -1)
  }
}

case class NormalizeText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    KernelRuntime.normalizeText(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.KernelRuntime.normalizeText($c)")
  override protected def withNewChildInternal(newChild: Expression): NormalizeText = copy(child = newChild)
}

case class TokenizeText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    KernelRuntime.tokenizeText(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.KernelRuntime.tokenizeText($c)")
  override protected def withNewChildInternal(newChild: Expression): TokenizeText = copy(child = newChild)
}

object NormalizeKernel {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
  def normalize(c: Column): Column = column(NormalizeText(expression(c)))
  def tokens(c: Column): Column = column(TokenizeText(expression(c)))
}
