package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from
  * higher-order functions so it stays inside codegen. Elements are cast
  * to double BEFORE any arithmetic and folded strictly left-to-right —
  * the DuckDB oracle mirrors the exact association
  * (`0.0 + x1 + x2 …` ≡ `list_reduce` seeded by x1, identical in IEEE
  * because 0.0 + x == x), giving bit-equal similarity scores and
  * therefore identical top-k orderings without rounding fudge.
  */
object VectorOps {

  /** Σ a_i · b_i in double precision, left-fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column = dot(a, a)

  /** Declarative form: value-identical to `cosine` below; kept as the
    * readable specification of the fold the custom expression mirrors.
    */
  def cosineDeclarative(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** One-pass custom expression (plans.CosineSim) — same doubles as the
    * declarative form (same per-index accumulation order), ~6× fewer
    * interpreted lambda passes per pair.
    */
  def cosine(a: Column, b: Column): Column =
    graft.plans.HashExpressions.cosineSim(a, b)

  /** Random-hyperplane LSH signature: bit j = [plane_j · v >= 0].
    * Plane values are materialized Scala constants (fixed seed) so the
    * oracle embeds the identical literals.
    */
  def lshPlanes(nPlanes: Int, dim: Int, seed: Long = 7L): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** plane · v as an unrolled literal sum (element_at is 1-based, like
    * DuckDB list indexing).
    */
  def planeDot(v: Column, plane: Array[Double]): Column =
    plane.zipWithIndex.map { case (p, i) =>
      lit(p) * element_at(v, i + 1).cast("double")
    }.reduceLeft(_ + _)

  /** One-pass kernel (plans.LshBucketKernel): all plane dots + sign
    * bits in a single loop over the array — value-identical to
    * `lshBucketDeclarative` (same per-plane ascending folds; parity
    * spec-pinned) without 512 element_at bounds checks per row.
    */
  def lshBucket(v: Column, planes: Seq[Array[Double]]): Column =
    graft.plans.HashExpressions.lshBucket(v, planes)

  /** Readable specification of the bucket the kernel mirrors. */
  def lshBucketDeclarative(v: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (plane, j) =>
      when(planeDot(v, plane) >= 0.0, lit(1L << j)).otherwise(lit(0L))
    }.reduceLeft[Column](_ + _)
}
