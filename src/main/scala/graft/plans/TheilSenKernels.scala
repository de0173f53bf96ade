package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Whole-series Theil-Sen / Mann-Kendall AGGREGATION kernels — the
  * r19 replacement for the series-keyed O(n²/2) pair JOIN that
  * `TimeOps.theilSen` / `mannKendall` planned until now.
  *
  * Why a kernel, and why it is safe where the r11 collect_list was
  * not: the r11 scale killer buffered all O(n²/2) pair SLOPES of a
  * series in one sort_array(collect_list(...)) aggregation buffer.
  * These kernels collect the series POINTS — and they are only
  * planned on the auto-route, where `sampleSeriesPoints` has already
  * bounded each series to the point budget (≤ 5,000 points ≈ 80 KB
  * per series for Theil-Sen, ≤ 63,488 ≈ 1 MB for Mann-Kendall). The
  * pair fan-out never leaves the kernel: slopes live in ONE transient
  * primitive scratch array (≤ ~100 MB worst case at the 5,000-point
  * route cap, freed per series), and Mann-Kendall needs no pair
  * materialization at all — S is an O(n log n) merge-sort inversion
  * count, pure integer/compare arithmetic.
  *
  * What this removes from the plan, per query: the self-join's
  * O(n²/2)-row fan-out through an exchange, and the full-series
  * WindowExec sort of all pair slopes. What remains: ONE hash
  * exchange of n points into the aggregate (plus the sampler's count
  * join, unchanged). At 1000 executors the shuffle volume drops from
  * O(Σ n²) rows to O(Σ n).
  *
  * EXACTNESS: the kernel evaluates the IDENTICAL doubles the join
  * route evaluates — slope = (v_b − v_a) / (t_b − t_a) with the
  * earlier-timestamp point as a, the lower median as the element at
  * rank ⌈N/2⌉ of the ascending sort (nulls first, exactly Spark's
  * window `orderBy(slope)` null placement), Sen's intercept as the
  * rank-⌈n/2⌉ element of v − slope·t. Same multiset, same pick ⇒
  * bit-identical output; TheilSenKernelSpec pins kernel ≡ join on
  * randomized frames and the DuckDB oracles are unchanged.
  * Timestamps ride as doubles: the contract (integer ts, |ts| < 2^53
  * — epoch micros are ~1.7e15) makes cast(ts as double) exact and
  * t_b − t_a bit-equal to the join route's int64 subtract-then-cast.
  *
  * Null/edge contract (mirrors the join route even though event
  * values are non-null by contract): null-ts points join no pair
  * (`t_a < t_b` is null); a null value yields a null slope which
  * sorts FIRST (Spark asc); a series with zero pairs (single point,
  * all-tied ts) emits n_pairs = 0 and is filtered out, exactly like
  * the join route's empty join. Tied timestamps within a series are
  * excluded pair-wise (strict `<`), and the sampler's keep rule runs
  * upstream in the plan, so the DuckDB oracle replay is untouched.
  */
case class TheilSenAggKernel(child: Expression, fracBuckets: Long, withLine: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = {
    val base = Seq(
      StructField("n_pairs", LongType, nullable = false),
      StructField("sen_slope", DoubleType, nullable = true))
    StructType(if (withLine) base :+ StructField("sen_intercept", DoubleType, nullable = true)
               else base)
  }
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    TheilSenRuntime.theilSenSeries(input.asInstanceOf[ArrayData], fracBuckets, withLine)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xs => {
      s"""
         |${ev.value} = graft.plans.TheilSenRuntime.theilSenSeries($xs, ${fracBuckets}L, $withLine);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TheilSenAggKernel =
    copy(child = newChild)
}

/** Mann-Kendall S over one collected series — O(n log n), no pair
  * materialization: D (discordant) is a merge-sort inversion count
  * over the ts-ordered values, T (ties) a sorted-run count, and
  * S = P − D with P = pairs − D − T. All integer counts and primitive
  * double comparisons — bit-exact with the join route's
  * sum(sign(v_b − v_a)) by construction (sign is a comparison; −0.0
  * vs 0.0 compare equal as primitives exactly like `signum` returning
  * ±0.0 casts to 0). s_stat is null iff no pair has both values
  * non-null (the join route's sum-of-all-null). NaN values are out of
  * contract (the join's `cast(signum(NaN) as long)` = 0 — a tie; the
  * kernel excludes NaN points, same 0 contribution to S).
  */
case class MannKendallAggKernel(child: Expression) extends UnaryExpression {
  // tie_adj = Σ over tied-VALUE groups of t·(t−1)·(2t+5) — the standard
  // Mann-Kendall tie correction term (Var(S) = [n(n−1)(2n+5) − tie_adj]
  // / 18), computed over the same value set S uses (non-null ts,
  // non-null non-NaN v) from the already-sorted tie scan; null exactly
  // when s_stat is null. Consumers of the plain no-ties z simply don't
  // select it.
  // tie_pairs = Σ t·(t−1)/2 over the same tie groups — the n1 term of
  // Kendall's τ_b denominator sqrt((n0 − n1)(n0 − n2)); n2 falls out
  // of n_pairs (n0 − n2 IS the ts-strict pair count), so τ_b needs no
  // further kernel state.
  override def dataType: DataType = StructType(Seq(
    StructField("n_pairs", LongType, nullable = false),
    StructField("s_stat", LongType, nullable = true),
    StructField("tie_adj", LongType, nullable = true),
    StructField("tie_pairs", LongType, nullable = true)))
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    TheilSenRuntime.mannKendallSeries(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xs => {
      s"""
         |${ev.value} = graft.plans.TheilSenRuntime.mannKendallSeries($xs);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MannKendallAggKernel =
    copy(child = newChild)
}

/** SEASONAL Theil-Sen (the Sen-slope half of the Hirsch-Slack 1984
  * seasonal toolkit, companion of `TimeOps.mannKendallSeasonal`): the
  * lower median of all WITHIN-season pairwise slopes of one series —
  * pairs never cross seasons, so a clean periodic cycle contributes
  * no slopes at all (the seasonal-MK pair rule applied to the
  * estimator). Input elements are [t, v, phase] triples; the kernel
  * runs the [[TheilSenAggKernel]] pair/median machinery per phase
  * bucket and ranks ONE combined slope multiset. Slope arithmetic,
  * nulls-first rank pick and the strict-ts pair rule are identical to
  * the plain kernel — the oracle is the ts_theilsen pair join plus a
  * phase-equality predicate. The sampler upstream bounds points PER
  * (series, season) (mirroring the seasonal-MK sampler contract), so
  * the scratch bound is seasons·budget²/2 — callers keep the default
  * seasonal budget small enough that the plain kernel's 1e8 backstop
  * still holds.
  */
case class SeasonalTheilSenAggKernel(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_pairs", LongType, nullable = false),
    StructField("sen_slope", DoubleType, nullable = true)))
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    TheilSenRuntime.seasonalTheilSenSeries(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xs => {
      s"""
         |${ev.value} = graft.plans.TheilSenRuntime.seasonalTheilSenSeries($xs);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SeasonalTheilSenAggKernel =
    copy(child = newChild)
}

object TsAggKernels {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** `fracBuckets` = ⌊pairFrac·10000⌋ or −1 for keep-all — the join
    * route's deterministic pair-hash keep rule evaluated in-kernel
    * (identical int64 arithmetic; see [[TheilSenRuntime.pairKept]]).
    */
  def theilSen(pts: Column, fracBuckets: Long): Column =
    column(TheilSenAggKernel(expression(pts), fracBuckets, withLine = false))

  def theilSenLine(pts: Column, fracBuckets: Long): Column =
    column(TheilSenAggKernel(expression(pts), fracBuckets, withLine = true))

  def mannKendall(pts: Column): Column =
    column(MannKendallAggKernel(expression(pts)))

  def seasonalTheilSen(pts: Column): Column =
    column(SeasonalTheilSenAggKernel(expression(pts)))
}

object TheilSenRuntime {
  private val D = java.lang.Double.valueOf(_: Double)
  private val L = java.lang.Long.valueOf(_: Long)

  /** The pair-sampling keep rule of the join route, verbatim:
    * pmod(pmod(ta,1000003)·1000033 + pmod(tb,1000003), 10000) <
    * fracBuckets. `Math.floorMod` IS Spark's pmod on int64.
    */
  @inline private def pairKept(ta: Long, tb: Long, fracBuckets: Long): Boolean =
    fracBuckets < 0L ||
      Math.floorMod(Math.floorMod(ta, 1000003L) * 1000033L + Math.floorMod(tb, 1000003L),
        10000L) < fracBuckets

  /** Extracts one collected series into parallel primitive arrays and
    * returns the count of non-null-ts entries, with `ord(0 until cnt)`
    * holding their indices in ascending-ts order. Arrays are sized m
    * (total entries) — null-ts entries live past `cnt` conceptually
    * (they are simply absent from `ord`).
    */
  private def extract(xs: ArrayData, ts: Array[Double], vs: Array[Double],
      tsNull: Array[Boolean], vNull: Array[Boolean]): Array[Int] = {
    val m = xs.numElements()
    var cnt = 0
    var i = 0
    while (i < m) {
      val e = xs.getArray(i)
      if (e.isNullAt(0)) tsNull(i) = true else { ts(i) = e.getDouble(0); cnt += 1 }
      if (e.isNullAt(1)) vNull(i) = true else vs(i) = e.getDouble(1)
      i += 1
    }
    val ord = new Array[Int](cnt)
    var w = 0
    i = 0
    while (i < m) { if (!tsNull(i)) { ord(w) = i; w += 1 }; i += 1 }
    // sort indices by ts ascending — boxed comparator sort; series are
    // sampler-bounded (≤ 63,488 points) so the boxing is noise
    val boxed = new Array[Integer](cnt)
    i = 0
    while (i < cnt) { boxed(i) = Integer.valueOf(ord(i)); i += 1 }
    java.util.Arrays.sort(boxed, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int =
        java.lang.Double.compare(ts(a.intValue()), ts(b.intValue()))
    })
    i = 0
    while (i < cnt) { ord(i) = boxed(i).intValue(); i += 1 }
    ord
  }

  def theilSenSeries(xs: ArrayData, fracBuckets: Long, withLine: Boolean): InternalRow = {
    val m = xs.numElements()
    val ts = new Array[Double](m); val vs = new Array[Double](m)
    val tsNull = new Array[Boolean](m); val vNull = new Array[Boolean](m)
    val ord = extract(xs, ts, vs, tsNull, vNull)
    val cnt = ord.length
    // pass 1: count kept pairs (strict ts order, optional pair hash) —
    // sizes the slope scratch exactly; the loop is the same O(pairs)
    // the fill pass costs, and pairs ≤ ~12.5M at the 5,000-point
    // route cap (TimeOps.KernelPointCap)
    var nPairs = 0L
    var runStart = 0
    var b = 1
    while (b < cnt) {
      if (ts(ord(b)) != ts(ord(b - 1))) runStart = b
      if (fracBuckets < 0L) nPairs += runStart
      else {
        val tbL = ts(ord(b)).toLong
        var a = 0
        while (a < runStart) {
          if (pairKept(ts(ord(a)).toLong, tbL, fracBuckets)) nPairs += 1
          a += 1
        }
      }
      b += 1
    }
    if (nPairs == 0L) {
      return if (withLine) new GenericInternalRow(Array[Any](L(0L), null, null))
             else new GenericInternalRow(Array[Any](L(0L), null))
    }
    // pass 2: fill slopes for kept pairs with both values non-null;
    // null-valued pairs only bump the nulls-first offset. The route
    // gate (TimeOps plans this kernel only under a ≤ 5,000-point
    // budget) keeps this ≤ ~12.5M; the require is the loud backstop
    // against planning it on an unbounded series
    require(nPairs <= 100000000L,
      s"TheilSenAggKernel: $nPairs pair slopes exceed the in-kernel scratch bound — " +
        "this kernel must only be planned on sampler-bounded series")
    val slopes = new Array[Double](nPairs.toInt)
    var w = 0
    var nullSlopes = 0L
    runStart = 0
    b = 1
    while (b < cnt) {
      val ib = ord(b)
      if (ts(ib) != ts(ord(b - 1))) runStart = b
      val tbL = if (fracBuckets >= 0L) ts(ib).toLong else 0L
      var a = 0
      while (a < runStart) {
        val ia = ord(a)
        if (fracBuckets < 0L || pairKept(ts(ia).toLong, tbL, fracBuckets)) {
          if (vNull(ia) || vNull(ib)) nullSlopes += 1
          else { slopes(w) = (vs(ib) - vs(ia)) / (ts(ib) - ts(ia)); w += 1 }
        }
        a += 1
      }
      b += 1
    }
    java.util.Arrays.sort(slopes, 0, w)
    val k = (nPairs + 1L) / 2L // lower-median rank, nulls first
    val slope: java.lang.Double =
      if (k <= nullSlopes) null else D(slopes((k - nullSlopes - 1L).toInt))
    if (!withLine) return new GenericInternalRow(Array[Any](L(nPairs), slope))
    // Sen's intercept: rank-⌈n/2⌉ element of v − slope·t over ALL
    // collected rows (null-ts rows count toward n and sort first,
    // exactly like the join route's window over the unfiltered points)
    val resids = new Array[Double](m)
    var rw = 0
    var nullResids = 0L
    if (slope == null) nullResids = m.toLong
    else {
      val s = slope.doubleValue()
      var i = 0
      while (i < m) {
        if (tsNull(i) || vNull(i)) nullResids += 1
        else { resids(rw) = vs(i) - s * ts(i); rw += 1 }
        i += 1
      }
    }
    java.util.Arrays.sort(resids, 0, rw)
    val kr = (m.toLong + 1L) / 2L
    val intercept: java.lang.Double =
      if (kr <= nullResids) null else D(resids((kr - nullResids - 1L).toInt))
    new GenericInternalRow(Array[Any](L(nPairs), slope, intercept))
  }

  /** Seasonal Sen slope over one collected series of [t, v, phase]
    * triples: the plain [[theilSenSeries]] pair/median machinery run
    * per phase bucket with ONE combined slope rank pick. Null-ts and
    * null-phase points join no pair (SQL's `a.phase = b.phase` is
    * never true on null); null-VALUED pairs count toward n_pairs and
    * sort first, exactly the plain kernel's nulls-first offset.
    */
  def seasonalTheilSenSeries(xs: ArrayData): InternalRow = {
    val m = xs.numElements()
    val ts = new Array[Double](m)
    val vs = new Array[Double](m)
    val ph = new Array[Double](m)
    val vNull = new Array[Boolean](m)
    var cnt = 0
    val elig = new Array[Int](m)
    var i = 0
    while (i < m) {
      val e = xs.getArray(i)
      val tNull = e.isNullAt(0)
      val pNull = e.isNullAt(2)
      if (!tNull) ts(i) = e.getDouble(0)
      if (e.isNullAt(1)) vNull(i) = true else vs(i) = e.getDouble(1)
      if (!pNull) ph(i) = e.getDouble(2)
      if (!tNull && !pNull) { elig(cnt) = i; cnt += 1 }
      i += 1
    }
    // sort eligible indices by (phase, ts) — phases become contiguous
    // runs, and within a phase the plain strict-ts pair walk applies
    val boxed = new Array[Integer](cnt)
    i = 0
    while (i < cnt) { boxed(i) = Integer.valueOf(elig(i)); i += 1 }
    java.util.Arrays.sort(boxed, new java.util.Comparator[Integer] {
      override def compare(x: Integer, y: Integer): Int = {
        val a = x.intValue(); val b = y.intValue()
        val c = java.lang.Double.compare(ph(a), ph(b))
        if (c != 0) c else java.lang.Double.compare(ts(a), ts(b))
      }
    })
    val ord = new Array[Int](cnt)
    i = 0
    while (i < cnt) { ord(i) = boxed(i).intValue(); i += 1 }
    // pass 1: count within-phase strict-ts pairs
    var nPairs = 0L
    var p0 = 0
    while (p0 < cnt) {
      var p1 = p0 + 1
      while (p1 < cnt && ph(ord(p1)) == ph(ord(p0))) p1 += 1
      var runStart = p0
      var b = p0 + 1
      while (b < p1) {
        if (ts(ord(b)) != ts(ord(b - 1))) runStart = b
        nPairs += runStart - p0
        b += 1
      }
      p0 = p1
    }
    if (nPairs == 0L)
      return new GenericInternalRow(Array[Any](L(0L), null))
    require(nPairs <= 100000000L,
      s"SeasonalTheilSenAggKernel: $nPairs pair slopes exceed the in-kernel scratch bound — " +
        "this kernel must only be planned on sampler-bounded series")
    // pass 2: fill slopes (identical arithmetic to the plain kernel)
    val slopes = new Array[Double](nPairs.toInt)
    var w = 0
    var nullSlopes = 0L
    p0 = 0
    while (p0 < cnt) {
      var p1 = p0 + 1
      while (p1 < cnt && ph(ord(p1)) == ph(ord(p0))) p1 += 1
      var runStart = p0
      var b = p0 + 1
      while (b < p1) {
        val ib = ord(b)
        if (ts(ib) != ts(ord(b - 1))) runStart = b
        var a = p0
        while (a < runStart) {
          val ia = ord(a)
          if (vNull(ia) || vNull(ib)) nullSlopes += 1
          else { slopes(w) = (vs(ib) - vs(ia)) / (ts(ib) - ts(ia)); w += 1 }
          a += 1
        }
        b += 1
      }
      p0 = p1
    }
    java.util.Arrays.sort(slopes, 0, w)
    val k = (nPairs + 1L) / 2L
    val slope: java.lang.Double =
      if (k <= nullSlopes) null else D(slopes((k - nullSlopes - 1L).toInt))
    new GenericInternalRow(Array[Any](L(nPairs), slope))
  }

  /** Strict inversion count (pairs a < b with v(b) < v(a)) via
    * bottom-up merge sort — equal elements take the left side first,
    * so ties never count. Sorts `v` in place; returns the count.
    */
  private def countInversions(v: Array[Double], n: Int): Long = {
    if (n < 2) return 0L
    var inv = 0L
    val buf = new Array[Double](n)
    var width = 1
    var src = v
    var dst = buf
    while (width < n) {
      var lo = 0
      while (lo < n) {
        val mid = math.min(lo + width, n)
        val hi = math.min(lo + 2 * width, n)
        var i = lo; var j = mid; var o = lo
        while (i < mid && j < hi) {
          if (src(j) < src(i)) { inv += (mid - i).toLong; dst(o) = src(j); j += 1 }
          else { dst(o) = src(i); i += 1 }
          o += 1
        }
        while (i < mid) { dst(o) = src(i); i += 1; o += 1 }
        while (j < hi) { dst(o) = src(j); j += 1; o += 1 }
        lo = hi
      }
      val t = src; src = dst; dst = t
      width *= 2
    }
    if (src ne v) System.arraycopy(src, 0, v, 0, n)
    inv
  }

  def mannKendallSeries(xs: ArrayData): InternalRow = {
    val m = xs.numElements()
    val ts = new Array[Double](m); val vs = new Array[Double](m)
    val tsNull = new Array[Boolean](m); val vNull = new Array[Boolean](m)
    val ord = extract(xs, ts, vs, tsNull, vNull)
    val cnt = ord.length
    // n_pairs: all strict-ts pairs = C(cnt,2) − Σ C(run,2)
    var nPairs = cnt.toLong * (cnt - 1L) / 2L
    var i = 0
    while (i < cnt) {
      var j = i + 1
      while (j < cnt && ts(ord(j)) == ts(ord(i))) j += 1
      val r = (j - i).toLong
      nPairs -= r * (r - 1L) / 2L
      i = j
    }
    if (nPairs == 0L) return new GenericInternalRow(Array[Any](L(0L), null, null, null))
    // s_stat's NULL verdict mirrors the join route's sum(sign(...)):
    // null iff NO cross-run pair has both values non-null. NaN values
    // count as non-null for that verdict (the join's
    // cast(signum(NaN) as long) = 0 — a zero contribution, not null),
    // but are excluded from the inversion count below, same net S.
    var totNN = 0L
    var totalNonNull = 0L
    i = 0
    while (i < cnt) {
      var j = i + 1
      while (j < cnt && ts(ord(j)) == ts(ord(i))) j += 1
      var nn = 0L
      var k2 = i
      while (k2 < j) { if (!vNull(ord(k2))) nn += 1; k2 += 1 }
      totNN -= nn * (nn - 1L) / 2L // subtract within-run pairs
      totalNonNull += nn
      i = j
    }
    totNN += totalNonNull * (totalNonNull - 1L) / 2L
    var tieAdj: java.lang.Long = null
    var tiePairs: java.lang.Long = null
    val sStat: java.lang.Long = if (totNN == 0L) null else {
      // seq = non-null non-NaN values in ts order; runOf = tied-ts run
      // id per entry (runs are contiguous, so within-run pairs can be
      // excluded from the merge-sort totals by a direct per-run loop
      // over the SAME array order)
      val seq = new Array[Double](cnt)
      val runOf = new Array[Int](cnt)
      var sn = 0
      var runId = 0
      i = 0
      while (i < cnt) {
        var j = i
        while (j < cnt && ts(ord(j)) == ts(ord(i))) {
          val idx = ord(j)
          if (!vNull(idx) && !java.lang.Double.isNaN(vs(idx))) {
            seq(sn) = vs(idx); runOf(sn) = runId; sn += 1
          }
          j += 1
        }
        runId += 1
        i = j
      }
      // within-run discordant/tied pairs (tiny runs by contract —
      // tied timestamps are out of contract entirely; this keeps the
      // kernel correct on them anyway, matching the join's strict-<)
      var dRun = 0L
      var tRun = 0L
      var runPairs = 0L
      var a = 0
      while (a < sn) {
        var b2 = a + 1
        while (b2 < sn && runOf(b2) == runOf(a)) b2 += 1
        var x = a
        while (x < b2) {
          var y = x + 1
          while (y < b2) {
            if (seq(y) < seq(x)) dRun += 1
            else if (seq(y) == seq(x)) tRun += 1
            y += 1
          }
          x += 1
        }
        val r = (b2 - a).toLong
        runPairs += r * (r - 1L) / 2L
        a = b2
      }
      val work = java.util.Arrays.copyOf(seq, sn)
      val dFull = countInversions(work, sn) // sorts `work` ascending
      // T: tied-value pairs from the sorted array (primitive == merges
      // −0.0/0.0 exactly like sign(v_b − v_a) = ±0.0 → 0 does)
      var tFull = 0L
      var tAdj = 0L
      var p = 0
      while (p < sn) {
        var q = p + 1
        while (q < sn && work(q) == work(p)) q += 1
        val r = (q - p).toLong
        tFull += r * (r - 1L) / 2L
        tAdj += r * (r - 1L) * (2L * r + 5L)
        p = q
      }
      tieAdj = L(tAdj)
      tiePairs = L(tFull)
      val dCross = dFull - dRun
      val tCross = tFull - tRun
      val pairsCross = sn.toLong * (sn - 1L) / 2L - runPairs
      val pCross = pairsCross - dCross - tCross
      L(pCross - dCross)
    }
    new GenericInternalRow(Array[Any](L(nPairs), sStat, tieAdj, tiePairs))
  }
}
