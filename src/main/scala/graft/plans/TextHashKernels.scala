package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** One-pass kernels for the text-hash pipelines.
  *
  * The declarative forms run interpreted higher-order lambdas whose
  * bodies go md5 → 32-char HEX STRING → substring → conv (string
  * parse) → cast per shingle/token. These kernels produce the SAME
  * 60-bit value straight from the digest bytes: the first 15 hex chars
  * of md5 are the first 7 bytes plus the high nibble of byte 7, i.e.
  * (Σ_{j<7} b_j << (52-8j)) | (b7 >>> 4) — TextHashKernelSpec pins
  * bit-equality against TextOps' Column forms (whose DuckDB twins the
  * oracles use).
  */
object TextHash {
  /** h60(s) % mod from raw UTF-8 bytes, one fresh MD5 per call site
    * thread (MessageDigest is not thread-safe; cheap to instantiate).
    */
  def h60mod(md: java.security.MessageDigest, s: org.apache.spark.unsafe.types.UTF8String, mod: Long): Long = {
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var j = 0
    while (j < 7) { v |= (d(j) & 0xffL) << (52 - 8 * j); j += 1 }
    v |= (d(7) & 0xf0L) >>> 4
    v % mod
  }
  def digest(): java.security.MessageDigest = java.security.MessageDigest.getInstance("MD5")

  private val tlDigest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest = digest()
  }

  /** Thread-cached MD5 for call sites invoked once per row (the
    * KernelRuntime static forwarders called from generated code):
    * `h60mod` resets before each digest, so cross-row reuse is safe,
    * and executor threads are long-lived so the cache never leaks.
    */
  def localDigest(): java.security.MessageDigest = tlDigest.get()
}

/** Token-shingle 60-bit hashes in one pass: shingle string
  * `tok(i) + " " + … + tok(i+n-1)` (byte-identical to the zip_with
  * concat chain), md5-h60, % mod. Empty array when fewer than n tokens
  * (matching the declarative `when(size < n, array())`).
  */
case class ShingleHash60(child: Expression, n: Int, mod: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    KernelRuntime.shingleHash60(input.asInstanceOf[ArrayData], n, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.KernelRuntime.shingleHash60($c, $n, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHash60 = copy(child = newChild)
}

/** Per-token h60 % mod array (simhash's token hashes, mod 2^32). */
case class TokenHash60(child: Expression, mod: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    KernelRuntime.tokenHash60(input.asInstanceOf[ArrayData], mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.KernelRuntime.tokenHash60($c, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): TokenHash60 = copy(child = newChild)
}

/** Rolling polynomial fingerprint fold h = (h·131 + h60(tok)%M) % M in
  * one pass (replaces the interpreted aggregate() with per-token
  * md5+conv lambdas). Integer arithmetic — exactly the declarative
  * fold.
  */
case class FingerprintKernel(child: Expression, mod: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(KernelRuntime.fingerprint(input.asInstanceOf[ArrayData], mod))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.KernelRuntime.fingerprint($c, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): FingerprintKernel = copy(child = newChild)
}

/** Shannon entropy (nats) of the token distribution — the vocabulary-
  * diversity quality signal (low entropy ⇒ repetitive/degenerate text).
  * One pass builds the count map; the sum −Σ (c/n)·ln(c/n) iterates
  * terms in LEXICOGRAPHIC order so the fold order is deterministic and
  * reproducible by the SQL twin's `list(c order by term)` — tokens are
  * normalized ASCII, where Java UTF-16 order ≡ DuckDB byte order. 0.0
  * for an empty token list.
  */
case class TokenEntropy(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    java.lang.Double.valueOf(KernelRuntime.tokenEntropy(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.KernelRuntime.tokenEntropy($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenEntropy = copy(child = newChild)
}

/** Strided-window span hashes in one byte pass: h60 of every
  * `winLen`-char window at stride `stride` over the (normalized, hence
  * ASCII) text; empty array when the text is shorter than one window.
  * Bit-identical to
  * `transform(sequence(1, length(t)-winLen+1, stride), i -> h60(substring(t, i, winLen)))`
  * — which is QUADRATIC in doc length: each UTF8String.substring scans
  * from byte 0 to locate its char offset, so a 100k-char doc pays
  * ~len²/(2·stride) byte touches (measured: real_dedup_substring spent
  * 137 s here at 4 cores, r19). The kernel indexes windows directly
  * (chars == bytes on normalized text) and feeds raw bytes to MD5 —
  * O(len·winLen/stride). Non-ASCII input (never produced by normalize;
  * pure defense) falls back to code-point windows via
  * UTF8String.substring, matching the declarative form exactly.
  */
case class SpanHash60(child: Expression, winLen: Int, stride: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    KernelRuntime.spanHash60(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], winLen, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.KernelRuntime.spanHash60($c, $winLen, $stride)")

  override protected def withNewChildInternal(newChild: Expression): SpanHash60 = copy(child = newChild)
}

/** Every `every`-th fixed-width frame's md5 hex in one byte pass — the
  * frame-sampling kernel behind [[graft.multimodal.Multimodal
  * .sampleFrames]]. Bit-identical strings to the declarative
  * `md5(substr(t, idx·frameChars + 1, frameChars))` chain (which pays a
  * from-byte-0 char-offset scan PER FRAME — the SpanHash60 lesson);
  * empty array for an empty payload (zero frames, no phantom md5('')).
  */
case class FrameMd5Kernel(child: Expression, frameChars: Int, every: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    KernelRuntime.frameMd5(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], frameChars, every)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.KernelRuntime.frameMd5($c, $frameChars, $every)")

  override protected def withNewChildInternal(newChild: Expression): FrameMd5Kernel = copy(child = newChild)
}

/** The trained BPE merge table applied to one word's symbol array —
  * returns the final token COUNT. Replaces `rounds` chained interpreted
  * [[graft.functions.TokenizerStats.mergeOnce]] aggregate() HOFs with
  * one static call; BpeKernelSpec pins count parity against the fold
  * chain (overlap runs, multi-round chains, fused-symbol reuse).
  */
case class BpeCountKernel(child: Expression, lhs: Array[String], rhs: Array[String])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(KernelRuntime.bpeTokenCount(
      input.asInstanceOf[ArrayData], lhs, rhs))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = ctx.addReferenceObj("bpeLhs", lhs, "java.lang.String[]")
    val r = ctx.addReferenceObj("bpeRhs", rhs, "java.lang.String[]")
    defineCodeGen(ctx, ev, c => s"graft.plans.KernelRuntime.bpeTokenCount($c, $l, $r)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeCountKernel = copy(child = newChild)
}

object TextHashKernels {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def frameMd5(text: Column, frameChars: Int, every: Int): Column =
    column(FrameMd5Kernel(expression(text), frameChars, every))
  def bpeCount(syms: Column, merges: Seq[(String, String)]): Column =
    column(BpeCountKernel(expression(syms),
      merges.map(_._1).toArray, merges.map(_._2).toArray))
  def shingleHash60(tokens: Column, n: Int, mod: Long): Column =
    column(ShingleHash60(expression(tokens), n, mod))
  def spanHash60(text: Column, winLen: Int, stride: Int): Column =
    column(SpanHash60(expression(text), winLen, stride))
  def tokenHash60(tokens: Column, mod: Long): Column =
    column(TokenHash60(expression(tokens), mod))
  def fingerprint(tokens: Column, mod: Long): Column =
    column(FingerprintKernel(expression(tokens), mod))
  def tokenEntropy(tokens: Column): Column =
    column(TokenEntropy(expression(tokens)))
}
