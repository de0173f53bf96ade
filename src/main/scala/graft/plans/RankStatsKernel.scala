package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Whole-series RANK-STATISTICS aggregation kernel — one collected
  * pass computing the integer state behind three nonparametric tests
  * (the tie-robust complements of the Mann-Kendall/Theil-Sen family
  * in [[TheilSenKernels]], same sampler/route contract):
  *
  *  - Spearman's ρ of value against time (tie-corrected): average
  *    value ranks vs average time ranks, carried as 2×rank so every
  *    sum is an exact int64 — d4 = Σ(rx2−rt2)², t12v/t12t = Σ(t³−t)
  *    over the value/ts tie groups. ρ's closed form
  *    (A12 + B12 − 3·d4) / (2·√(A12·B12)) with A12 = n³−n−t12v,
  *    B12 = n³−n−t12t reduces to the classic 1 − 6Σd²/(n³−n) when
  *    ties vanish; all-tied series → A12 = 0 → NULL (undefined ρ).
  *  - Pettitt's changepoint statistic: U_t = t(n+1) − Σ_{k≤t} rx2
  *    (integer, the rank form of the double-sum sign statistic),
  *    K = max_{1≤t<n} |U_t| with the FIRST maximizing position's
  *    timestamp as the changepoint candidate.
  *  - Wald-Wolfowitz runs about the LOWER MEDIAN (the house type-1
  *    pick, rank ⌈n/2⌉ of the ascending sort): values equal to the
  *    median are discarded (the classical convention), runs counted
  *    over the remaining time-ordered signs.
  *
  * Everything is integer/compare arithmetic — the one FP surface per
  * test is a single fixed-op-order double expression evaluated OUTSIDE
  * the kernel (shared verbatim with the DuckDB oracle, see
  * `TimeOps.SpearmanRhoSql` etc.), so cross-engine equality is exact
  * by construction rather than by accumulation-order luck.
  *
  * Complete-case contract: a point participates iff BOTH ts and value
  * are non-null (the oracle's `where value is not null` over non-null
  * ts). NaN values are in-band and sort LAST, tying with each other —
  * `java.lang.Double.compare` ordering with a primitive-== tie merge,
  * which also merges −0.0/0.0 exactly like both engines' ORDER BY and
  * rank() do. Tied timestamps are out of contract (unique ts per
  * series); the kernel stays deterministic on them anyway via a
  * (ts, value, position) sort key.
  *
  * Scale: points arrive sampler-bounded (≤ 63,488 per series ≈ 1 MB,
  * the [[TheilSenKernels]] budget contract), all scratch is O(n)
  * primitive arrays, cost O(n log n) per series — the whole plan is
  * ONE hash exchange of n points (plus the sampler's count join).
  */
case class RankStatsAggKernel(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_cc", LongType, nullable = false),
    StructField("d4", LongType, nullable = false),
    StructField("t12v", LongType, nullable = false),
    StructField("t12t", LongType, nullable = false),
    StructField("k_stat", LongType, nullable = true),
    StructField("cp_t", LongType, nullable = true),
    StructField("n_above", LongType, nullable = false),
    StructField("n_below", LongType, nullable = false),
    StructField("runs", LongType, nullable = false),
    StructField("s_plus", LongType, nullable = false),
    StructField("s_minus", LongType, nullable = false)))
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    RankStatsRuntime.rankStatsSeries(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xs => {
      s"""
         |${ev.value} = graft.plans.RankStatsRuntime.rankStatsSeries($xs);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RankStatsAggKernel =
    copy(child = newChild)
}

object RankStatsRuntime {
  private val L = java.lang.Long.valueOf(_: Long)

  /** Primitive-== equality with a NaN self-tie: merges −0.0/0.0 (both
    * engines' rank() does) and groups NaNs into one tie run (DuckDB
    * treats NaN = NaN as true and greatest; Double.compare sorts them
    * last, so the run is contiguous).
    */
  @inline private def tieEq(a: Double, b: Double): Boolean =
    a == b || (java.lang.Double.isNaN(a) && java.lang.Double.isNaN(b))

  private def sortedIdx(n: Int, cmp: (Int, Int) => Int): Array[Int] = {
    val boxed = new Array[Integer](n)
    var i = 0
    while (i < n) { boxed(i) = Integer.valueOf(i); i += 1 }
    java.util.Arrays.sort(boxed, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = cmp(a.intValue(), b.intValue())
    })
    val out = new Array[Int](n)
    i = 0
    while (i < n) { out(i) = boxed(i).intValue(); i += 1 }
    out
  }

  def rankStatsSeries(xs: ArrayData): InternalRow = {
    val m = xs.numElements()
    val ts = new Array[Double](m)
    val vs = new Array[Double](m)
    var n = 0
    var i = 0
    while (i < m) {
      val e = xs.getArray(i)
      if (!e.isNullAt(0) && !e.isNullAt(1)) {
        ts(n) = e.getDouble(0); vs(n) = e.getDouble(1); n += 1
      }
      i += 1
    }
    if (n == 0)
      return new GenericInternalRow(Array[Any](
        L(0L), L(0L), L(0L), L(0L), null, null, L(0L), L(0L), L(0L), L(0L), L(0L)))
    val ordT = sortedIdx(n, (a, b) => {
      val c = java.lang.Double.compare(ts(a), ts(b))
      if (c != 0) c
      else {
        val c2 = java.lang.Double.compare(vs(a), vs(b))
        if (c2 != 0) c2 else Integer.compare(a, b)
      }
    })
    val ordV = sortedIdx(n, (a, b) => {
      val c = java.lang.Double.compare(vs(a), vs(b))
      if (c != 0) c else Integer.compare(a, b)
    })
    // average ranks ×2: a tie run occupying 0-based sorted positions
    // [a, b) has min-rank a+1 and size b−a, so 2·avgRank = a + b + 1
    val rt2 = new Array[Long](n) // by original index
    var t12t = 0L
    var a = 0
    while (a < n) {
      var b = a + 1
      while (b < n && ts(ordT(b)) == ts(ordT(a))) b += 1
      val t = (b - a).toLong
      t12t += t * t * t - t
      var k = a
      while (k < b) { rt2(ordT(k)) = (a + b + 1).toLong; k += 1 }
      a = b
    }
    val rx2 = new Array[Long](n)
    var t12v = 0L
    a = 0
    while (a < n) {
      var b = a + 1
      while (b < n && tieEq(vs(ordV(b)), vs(ordV(a)))) b += 1
      val t = (b - a).toLong
      t12v += t * t * t - t
      var k = a
      while (k < b) { rx2(ordV(k)) = (a + b + 1).toLong; k += 1 }
      a = b
    }
    // Spearman d4: matched per-observation rank-pair differences.
    // Bounds: |rx2 − rt2| < 2n, so d4 < 4n³ ≈ 1.0e15 at the 63,488
    // sampler cap — no int64 overflow anywhere in this kernel.
    var d4 = 0L
    i = 0
    while (i < n) { val d = rx2(i) - rt2(i); d4 += d * d; i += 1 }
    // Pettitt: prefix sums of rx2 in time order; first max of |U_t|
    // over the interior split points t = 1..n−1 (U_n ≡ 0)
    var kStat: java.lang.Long = null
    var cpT: java.lang.Long = null
    if (n >= 2) {
      var pref = 0L
      var best = -1L
      var bestT = 0.0
      var t = 1
      while (t <= n - 1) {
        pref += rx2(ordT(t - 1))
        val u = t.toLong * (n + 1L) - pref
        val au = math.abs(u)
        if (au > best) { best = au; bestT = ts(ordT(t - 1)) }
        t += 1
      }
      kStat = L(best)
      cpT = L(bestT.toLong) // integer-ts contract: the cast is exact
    }
    // runs about the lower median (type-1 pick); equal-to-median
    // observations are discarded, matching the oracle's value <> med
    val med = vs(ordV((n + 1) / 2 - 1))
    var nAbove = 0L
    var nBelow = 0L
    var runs = 0L
    var prev = 0 // 0 = start, 1 = above, −1 = below
    i = 0
    while (i < n) {
      val v = vs(ordT(i))
      if (!tieEq(v, med)) {
        val s = if (java.lang.Double.compare(v, med) > 0) 1 else -1
        if (s > 0) nAbove += 1 else nBelow += 1
        if (s != prev) runs += 1
        prev = s
      }
      i += 1
    }
    // Cox-Stuart pairing: observation i (time order) against its
    // second-half partner i + (n − n/2); odd n drops the middle. Tied
    // pairs are discarded (the classical sign-test convention);
    // Double.compare gives NaN-greatest direction, tieEq the ±0 merge.
    val half = n / 2
    val off = n - half
    var sPlus = 0L
    var sMinus = 0L
    i = 0
    while (i < half) {
      val va = vs(ordT(i))
      val vb = vs(ordT(i + off))
      if (!tieEq(va, vb)) {
        if (java.lang.Double.compare(vb, va) > 0) sPlus += 1 else sMinus += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      L(n.toLong), L(d4), L(t12v), L(t12t), kStat, cpT, L(nAbove), L(nBelow), L(runs),
      L(sPlus), L(sMinus)))
  }
}

object RankStatsKernel {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def rankStats(pts: Column): Column =
    column(RankStatsAggKernel(expression(pts)))
}
