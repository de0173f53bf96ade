package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the dedup signature kernels.
  *
  * The declarative forms (k× `array_min(transform(...))`, 32×
  * `size(filter(...))`) are interpreted lambda evaluations — k/32
  * passes over every hash array with per-element closure overhead.
  * These expressions compute the same values in ONE tight JVM pass per
  * row (~10× observed). They are CodegenFallback: the inner loop is
  * already compiled Scala, and one virtual call per row is noise
  * compared to the loop body.
  *
  * Both must stay value-identical to their DuckDB SQL twins
  * (SqlTwins.minhashOne / simhash32): pure int64 arithmetic, no FP.
  */

/** All k minhash permutation minima in one pass:
  * out(j) = min_i (as(j)*h_i + bs(j)) % mod ; null on empty/null input
  * (matching array_min-of-empty).
  */
case class MinhashPerms(child: Expression, as: Array[Long], bs: Array[Long], mod: Long)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val k = as.length
    val out = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < k) {
        val v = (as(j) * h + bs(j)) % mod
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashPerms = copy(child = newChild)
}

/** 32-bit SimHash from a token-hash array in one pass: bit j set when
  * 2·(#hashes with bit j) >= n (ties → 1, matching the declarative
  * form).
  */
case class SimHash32(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](32)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < 32) {
        counts(j) += ((h >> j) & 1L).toInt
        j += 1
      }
      i += 1
    }
    var sim = 0L
    var j = 0
    while (j < 32) {
      if (2 * counts(j) >= n) sim |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(sim)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash32 = copy(child = newChild)
}

/** Cosine similarity between two float-array embeddings in one pass.
  * Value-identical to the declarative
  * `aggregate(zip_with(a,b,(x,y)->xd*yd), 0.0, +) / (sqrt(naa)*sqrt(nbb))`
  * form and to SqlTwins.cosine: per-element float→double casts,
  * 0.0-seeded in-order accumulation, dot/(sqrt·sqrt) — replacing six
  * interpreted lambda passes per pair with one loop.
  *
  * Inputs are type-checked to array<float> (an array<double> argument
  * fails analysis instead of silently reading garbage bytes); arrays of
  * different lengths yield NULL, matching the declarative form (whose
  * zip_with null-pads the shorter side, turning the dot into NULL).
  */
case class CosineSim(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def isFloatArray(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires array<float> inputs, got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** All hyperplane dots + sign bits in one pass over the embedding:
  * bucket = Σ_j [plane_j · v ≥ 0]·2^j. Value-identical to the unrolled
  * `planeDot`/`lshBucket` Column form (same per-plane ascending fold of
  * literal·element products; integer bit sum is order-exact): a vector
  * shorter than a plane, or containing a NULL element, makes every
  * declarative dot NULL and each `when` fall through to 0 — bucket 0 —
  * which the kernel reproduces.
  */
case class LshBucketKernel(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  // a NULL vector buckets to 0, exactly like the declarative form
  // (every planeDot NULL → every `when` falls through to 0); the
  // default UnaryExpression.eval would short-circuit NULL → NULL and
  // silently drop such rows from bucket joins
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) java.lang.Long.valueOf(0L) else nullSafeEval(v)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val dim = if (planes.isEmpty) 0 else planes(0).length
    if (arr.numElements() < dim) return java.lang.Long.valueOf(0L)
    var i = 0
    while (i < dim) {
      if (arr.isNullAt(i)) return java.lang.Long.valueOf(0L)
      i += 1
    }
    var b = 0L
    var j = 0
    while (j < planes.length) {
      val p = planes(j)
      var s = 0.0
      i = 0
      while (i < dim) {
        s += p(i) * arr.getFloat(i).toDouble
        i += 1
      }
      if (s >= 0.0) b |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(b)
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucketKernel = copy(child = newChild)
}

/** 0-based index of the cosine-nearest centroid (ties → lowest index)
  * in one pass over the embedding — the zero-shuffle IVF assignment.
  *
  * Value-identical to scoring the row against every centroid with
  * CosineSim and taking `min_by(cid, struct(-ccos, cid))` over the
  * corpus × centroids cross-join, PROVIDED the centroid array is
  * ordered by ascending cell id: cosine arithmetic is the same
  * index-ascending double accumulation (the norm hoists are bit-exact —
  * each accumulator is independent, and IEEE multiplication commutes),
  * and the strict `>` comparison keeps the first (lowest-index) maximum
  * exactly as the ordering struct's cid tie-break does. A centroid
  * whose length differs from the row vector is skipped (its CosineSim
  * would be NULL); if no centroid matches, the result is NULL.
  * NaN inputs are out of contract (as for the min_by form).
  */
case class NearestCentroidKernel(
    child: Expression,
    centroids: Array[Array[Double]],
    l2: Boolean = false)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  @transient private lazy val cnorms: Array[Double] = centroids.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    math.sqrt(s)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (l2) {
      // squared-L2 argmin, ties → lowest index (strict < keeps the
      // first minimum); index-ascending left-fold of (x-c)² terms, the
      // association the generated SQL twin replicates verbatim
      var best = Double.PositiveInfinity
      var bestIdx = -1
      var j = 0
      while (j < centroids.length) {
        val c = centroids(j)
        if (c.length == n) {
          var d = 0.0
          var i = 0
          while (i < n) { val t = arr.getFloat(i).toDouble - c(i); d += t * t; i += 1 }
          if (d < best) { best = d; bestIdx = j }
        }
        j += 1
      }
      return if (bestIdx < 0) null else java.lang.Integer.valueOf(bestIdx)
    }
    var na = 0.0
    var i = 0
    while (i < n) { val x = arr.getFloat(i).toDouble; na += x * x; i += 1 }
    val sna = math.sqrt(na)
    var best = Double.NegativeInfinity
    var bestIdx = -1
    var j = 0
    while (j < centroids.length) {
      val c = centroids(j)
      if (c.length == n) {
        var dot = 0.0
        i = 0
        while (i < n) { dot += arr.getFloat(i).toDouble * c(i); i += 1 }
        val cos = dot / (sna * cnorms(j))
        if (cos > best) { best = cos; bestIdx = j }
      }
      j += 1
    }
    if (bestIdx < 0) null else java.lang.Integer.valueOf(bestIdx)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidKernel =
    copy(child = newChild)
}

object HashExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def minhashPerms(hashes: Column, params: Seq[(Long, Long)], mod: Long): Column =
    column(MinhashPerms(expression(hashes), params.map(_._1).toArray, params.map(_._2).toArray, mod))

  def simhash32(hashes: Column): Column = column(SimHash32(expression(hashes)))

  def cosineSim(a: Column, b: Column): Column = column(CosineSim(expression(a), expression(b)))

  def lshBucket(v: Column, planes: Seq[Array[Double]]): Column =
    column(LshBucketKernel(expression(v), planes.toArray))

  def nearestCentroid(v: Column, centroids: Seq[Array[Double]]): Column =
    column(NearestCentroidKernel(expression(v), centroids.toArray))

  def nearestCentroidL2(v: Column, centroids: Seq[Array[Double]]): Column =
    column(NearestCentroidKernel(expression(v), centroids.toArray, l2 = true))
}
