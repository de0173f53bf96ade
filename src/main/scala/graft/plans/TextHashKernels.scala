package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val nt = arr.numElements()
    if (nt < n) return new GenericArrayData(Array.empty[Long])
    val md = TextHash.digest()
    val out = new Array[Long](nt - n + 1)
    val toks = new Array[String](nt)
    var i = 0
    while (i < nt) { toks(i) = arr.getUTF8String(i).toString; i += 1 }
    i = 0
    while (i <= nt - n) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      out(i) = TextHash.h60mod(md,
        org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString), mod)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHash60 = copy(child = newChild)
}

/** Per-token h60 % mod array (simhash's token hashes, mod 2^32). */
case class TokenHash60(child: Expression, mod: Long)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val md = TextHash.digest()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = TextHash.h60mod(md, arr.getUTF8String(i), mod); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): TokenHash60 = copy(child = newChild)
}

/** Rolling polynomial fingerprint fold h = (h·131 + h60(tok)%M) % M in
  * one pass (replaces the interpreted aggregate() with per-token
  * md5+conv lambdas). Integer arithmetic — exactly the declarative
  * fold.
  */
case class FingerprintKernel(child: Expression, mod: Long)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val md = TextHash.digest()
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h * 131L + TextHash.h60mod(md, arr.getUTF8String(i), mod)) % mod
      i += 1
    }
    java.lang.Long.valueOf(h)
  }

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
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return java.lang.Double.valueOf(0.0)
    val counts = new java.util.TreeMap[String, Int]()
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i).toString
      counts.merge(t, 1, (a, b) => a + b)
      i += 1
    }
    val nd = n.toDouble
    var h = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().toDouble / nd
      h += p * math.log(p)
    }
    // + 0.0 canonicalizes the single-token case's -0.0 to 0.0
    java.lang.Double.valueOf(-h + 0.0)
  }

  override protected def withNewChildInternal(newChild: Expression): TokenEntropy = copy(child = newChild)
}

object TextHashKernels {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def shingleHash60(tokens: Column, n: Int, mod: Long): Column =
    column(ShingleHash60(expression(tokens), n, mod))
  def tokenHash60(tokens: Column, mod: Long): Column =
    column(TokenHash60(expression(tokens), mod))
  def fingerprint(tokens: Column, mod: Long): Column =
    column(FingerprintKernel(expression(tokens), mod))
  def tokenEntropy(tokens: Column): Column =
    column(TokenEntropy(expression(tokens)))
}
