package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the dedup/ANN signature kernels.
  *
  * The declarative forms (k× `array_min(transform(...))`, 32×
  * `size(filter(...))`) are interpreted lambda evaluations — k/32
  * passes over every hash array with per-element closure overhead.
  * These expressions compute the same values in ONE tight JVM pass per
  * row (~10× observed).
  *
  * The per-row bodies live in [[KernelRuntime]]: `nullSafeEval` and the
  * generated (whole-stage codegen) Java both call the same static
  * method, so interpreted and codegen paths are bit-identical by
  * construction and the expressions sit INSIDE codegen instead of on
  * the interpreted CodegenFallback path (CodegenWiringSpec pins both).
  *
  * All must stay value-identical to their DuckDB SQL twins
  * (SqlTwins.minhashOne / simhash32 / cosine): pure int64/IEEE
  * arithmetic in the twin's association order.
  */

/** All k minhash permutation minima in one pass:
  * out(j) = min_i (as(j)*h_i + bs(j)) % mod ; null on empty/null input
  * (matching array_min-of-empty).
  */
case class MinhashPerms(child: Expression, as: Array[Long], bs: Array[Long], mod: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    KernelRuntime.minhashPerms(input.asInstanceOf[ArrayData], as, bs, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("minhashAs", as, "long[]")
    val bsRef = ctx.addReferenceObj("minhashBs", bs, "long[]")
    // not defineCodeGen: empty input → null result, isNull must track it
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.plans.KernelRuntime.minhashPerms($c, $asRef, $bsRef, ${mod}L);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashPerms = copy(child = newChild)
}

/** All `dim` signed hashing-trick bucket sums in one pass over a
  * token-hash array — the fused TextOps.hashFeatures kernel. An empty
  * array yields the all-zero vector (matching the 0-seeded aggregates
  * of the declarative form).
  */
case class HashFeatureVec(child: Expression, dim: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    KernelRuntime.hashFeatureVec(input.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.KernelRuntime.hashFeatureVec($c, $dim)")

  override protected def withNewChildInternal(newChild: Expression): HashFeatureVec = copy(child = newChild)
}

/** 32-bit SimHash from a token-hash array in one pass: bit j set when
  * 2·(#hashes with bit j) >= n (ties → 1, matching the declarative
  * form).
  */
case class SimHash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(KernelRuntime.simhash32(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.KernelRuntime.simhash32($c)")

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
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
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

  override def nullSafeEval(l: Any, r: Any): Any =
    KernelRuntime.cosineSim(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("cosineSim")
      s"""
         |java.lang.Double $tmp = graft.plans.KernelRuntime.cosineSim($a, $b);
         |${ev.isNull} = $tmp == null;
         |if (!${ev.isNull}) ${ev.value} = $tmp.doubleValue();
       """.stripMargin
    })

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
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  // a NULL vector buckets to 0, exactly like the declarative form
  // (every planeDot NULL → every `when` falls through to 0); the
  // default UnaryExpression.eval would short-circuit NULL → NULL and
  // silently drop such rows from bucket joins
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    java.lang.Long.valueOf(
      if (v == null) 0L else KernelRuntime.lshBucket(v.asInstanceOf[ArrayData], planes))
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(KernelRuntime.lshBucket(input.asInstanceOf[ArrayData], planes))

  // hand-rolled (not nullSafeCodeGen, which would short-circuit a null
  // child to a null result): null child → bucket 0, result never null
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val planesRef = ctx.addReferenceObj("lshPlanes", planes, "double[][]")
    ev.copy(
      code = code"""
        |${c.code}
        |long ${ev.value} = ${c.isNull} ? 0L :
        |  graft.plans.KernelRuntime.lshBucket(${c.value}, $planesRef);
       """.stripMargin,
      isNull = FalseLiteral)
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
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  @transient private lazy val cnorms: Array[Double] = centroids.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    math.sqrt(s)
  }

  override def nullSafeEval(input: Any): Any =
    KernelRuntime.nearestCentroid(input.asInstanceOf[ArrayData], centroids, cnorms, l2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val nRef = ctx.addReferenceObj("centroidNorms", cnorms, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("nearCentroid")
      s"""
         |java.lang.Integer $tmp = graft.plans.KernelRuntime.nearestCentroid($c, $cRef, $nRef, $l2);
         |${ev.isNull} = $tmp == null;
         |if (!${ev.isNull}) ${ev.value} = $tmp.intValue();
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidKernel =
    copy(child = newChild)
}

object HashExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def minhashPerms(hashes: Column, params: Seq[(Long, Long)], mod: Long): Column =
    column(MinhashPerms(expression(hashes), params.map(_._1).toArray, params.map(_._2).toArray, mod))

  def simhash32(hashes: Column): Column = column(SimHash32(expression(hashes)))

  def hashFeatureVec(hashes: Column, dim: Int): Column =
    column(HashFeatureVec(expression(hashes), dim))

  def cosineSim(a: Column, b: Column): Column = column(CosineSim(expression(a), expression(b)))

  def lshBucket(v: Column, planes: Seq[Array[Double]]): Column =
    column(LshBucketKernel(expression(v), planes.toArray))

  def nearestCentroid(v: Column, centroids: Seq[Array[Double]]): Column =
    column(NearestCentroidKernel(expression(v), centroids.toArray))

  def nearestCentroidL2(v: Column, centroids: Seq[Array[Double]]): Column =
    column(NearestCentroidKernel(expression(v), centroids.toArray, l2 = true))
}
