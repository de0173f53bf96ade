package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** STL-style ROBUST seasonal decomposition — the outlier-resistant
  * upgrade of [[TimeOps.seasonalDecompose]] (classical additive), in
  * the spirit of Cleveland et al.'s STL (J. Official Statistics 1990):
  * a LOESS trend, phase-mean seasonal, and ONE outer robustness
  * iteration that re-weights both by bisquare weights of the first
  * pass's remainder — so a wild outlier no longer drags the trend or
  * pollutes its phase's seasonal index (the property classical
  * decomposition lacks; pinned in StlSpec).
  *
  * Exactness design (every float op identical cross-engine):
  *  - LOESS pass 1 (all robustness weights 1): the degree-1 local fit
  *    at the center of a SYMMETRIC tricube window reduces to a
  *    weighted moving average, so the trend is a fixed 2q+1-tap
  *    convolution whose normalized coefficients are LITERAL doubles
  *    computed once here and emitted into both the Column tree and
  *    the DuckDB SQL (the TaylorBasis pattern) — one left-associated
  *    fold, bit-identical.
  *  - LOESS pass 2 carries data-dependent weights ρ, so the local
  *    linear fit is evaluated from five explicit weighted sums
  *    (Σwρ, Σwρu, Σwρu², Σwρv, Σwρuv; u = integer tap offset) — each
  *    a left-associated fold over the same tap order with literal
  *    w·u coefficients; the fitted value at the center is the
  *    intercept (S2·T0 − S1·T1)/(S0·S2 − S1²).
  *  - Everything aggregated across engine-ORDER-DEPENDENT sets
  *    (seasonal phase means, the remainder median) runs in s4
  *    INTEGER space: detrended values and weights are quantized with
  *    floor(x·10⁴ + 0.5) (identical FP ops, unlike round()'s
  *    cross-engine halfway semantics), integer sums are exact and
  *    association-free, and the published trend/seasonal/remainder/ρ
  *    are s4-scaled BIGINTs — zero FP-aggregation hash surface.
  *  - Robustness weights: a4 = |remainder₁|·10⁴ as integer, per-series
  *    lower median picked by rank (row_number over a4 NULLS LAST —
  *    the engines' default null order differs — with the time column
  *    as tiebreak), h = 6·median (STL's convention), bisquare
  *    ρ = (1 − u²)² for u = a4/h < 1 else 0; rows the LOESS window
  *    could not reach (edges) and degenerate series (h = 0 or no
  *    median) keep ρ = 1.
  *
  * Scale shape: everything rides window partitions keyed on the
  * series (or series × phase) over the RESAMPLED daily spine — rows
  * ≈ series × days, orders of magnitude below the event count; the
  * median pick is the bounded rank-pick shape (no collect_list
  * buffer, WindowExec spills), matching the theilSen r12 fix. Edge
  * rows (within q of either end) publish null trend/remainder — the
  * classical truncated-window convention.
  */
object Stl {

  /** Tricube weight table over taps −q..q, |u| scaled by (q+1) so the
    * boundary taps stay positive (the loess interior convention).
    */
  def tricube(q: Int): IndexedSeq[Double] = (-q to q).map { i =>
    val u = math.abs(i).toDouble / (q + 1.0)
    val t = 1.0 - u * u * u
    t * t * t
  }

  /** Pass-1 normalized convolution coefficients (weights / Σweights),
    * computed HERE once so both engines consume identical literals.
    */
  def pass1Coefs(q: Int): IndexedSeq[Double] = {
    val w = tricube(q)
    val s0 = w.sum
    w.map(_ / s0)
  }

  private def tap(c: Column, i: Int, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    if (i < 0) lag(c, -i).over(w) else if (i == 0) c else lead(c, i).over(w)

  private def s4(c: Column): Column = floor(c * lit(10000d) + lit(0.5d)).cast("long")

  /** `useKernel = true` (default): both loess passes run as frame-fold
    * AGGREGATES ([[graft.plans.FrameAggKernels]], r21) — the fit is
    * computed directly inside the window over a primitive (ρ, v)
    * buffer, with no boxed collect_list materialization and no
    * 2·(2q+1) offset frame processors (the r12→r21 cost ladder:
    * declarative folds ~2× the query; collect_list + scalar kernel
    * −50%; the aggregate another −17..−35% measured at sf0.1).
    * `false` keeps the declarative lag/lead fold form; StlSpec pins
    * both paths bit-equal (same fold order by construction).
    *
    * `outerIters` (r13): Cleveland's STL runs n_o ≥ 1 outer
    * robustness passes with convergence in 2-3; each extra pass
    * recomputes the bisquare weights from the CURRENT remainder
    * (|d4 − seasonal_s4|) and re-runs the SAME weighted loess +
    * weighted phase-mean kernels — so an outlier whose first-pass
    * remainder was partially absorbed into the fit loses MORE
    * leverage on the second pass (spec-pinned). Every iteration rides
    * the same series/phase window partitioning: the plan grows window
    * nodes linearly but never adds an exchange.
    */
  def robustDecompose(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      orderCol: String,
      phase: Column,
      q: Int,
      useKernel: Boolean = true,
      outerIters: Int = 1): DataFrame = {
    require(outerIters >= 1, s"need at least one robustness pass, got $outerIters")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(orderCol))
    val frame = w.rowsBetween(-q, q)
    val v = col(valueCol)
    val taps = -q to q
    val c1 = pass1Coefs(q)
    val wt = tricube(q)

    // pass 1: literal-coefficient tricube moving average (the rho≡1
    // local-linear fit at a symmetric window's center)
    val trend1 =
      if (useKernel) graft.plans.FrameAggKernels.conv(v, c1.toArray).over(frame)
      else taps.map(i => lit(c1(i + q)) * tap(v, i, w)).reduceLeft(_ + _)
    val pw = Window.partitionBy(groupCols.map(col) :+ col("phase"): _*)
    // iteration state: __d4 = s4 detrended value, __ss4 = s4 seasonal
    val base = df
      .withColumn("phase", phase)
      .withColumn("__d4", s4(v - trend1))
    val withS1 = base.withColumn("__s1",
      sum(col("__d4")).over(pw).cast("double") / count(col("__d4")).over(pw).cast("double") / lit(10000d))
      .withColumn("__ss4", floor(col("__s1") * lit(10000d) + lit(0.5d)).cast("long"))

    val wRank = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__a4").asc_nulls_last, col(orderCol))
    // full-frame twin of wRank, NOT a partition-only spec: the shared
    // (partition, order) lets __cnt ride the __rn WindowExec and __med
    // the next one — a partition-only spec beside a sorted one plans a
    // SEPARATE buffering WindowExec per use (the r12 window-cost
    // lesson; same values either way, count/max over the full frame)
    val wAll = wRank.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    def fold(src: Column, coef: Int => Double): Column =
      taps.map(i => lit(coef(i)) * tap(src, i, w)).reduceLeft(_ + _)
    val w0 = taps.map(i => wt(i + q)).toArray
    val w1 = taps.map(i => wt(i + q) * i).toArray
    val w2 = taps.map(i => wt(i + q) * i * i).toArray

    var cur = withS1
    var o = 1
    while (o <= outerIters) {
      // robustness weights from the CURRENT remainder |d4 − ss4|:
      // per-series lower median by bounded rank pick, h = 6·median,
      // bisquare ρ = (1 − u²)² (edges/degenerate series keep ρ = 1)
      val withA4 = cur.withColumn("__a4", abs(col("__d4") - col("__ss4")))
      val withMed = withA4
        // one projection → one shared-spec WindowExec for rank + count
        // (sequential withColumn would plant a node per call)
        .withColumns(Map(
          "__rn" -> row_number().over(wRank),
          "__cnt" -> count(col("__a4")).over(wAll)))
        .withColumn("__med",
          max(when(col("__rn") === ((col("__cnt") + 1) / 2).cast("long"), col("__a4"))).over(wAll))
      val h = col("__med") * lit(6L)
      val u = col("__a4").cast("double") / h.cast("double")
      val biT = lit(1.0) - u * u
      val withRho = withMed.withColumn("rho",
        when(col("__a4").isNull, lit(1.0))
          .when(col("__med").isNull, lit(1.0))
          .when(h === 0, lit(1.0))
          .when(u >= 1.0, lit(0.0))
          .otherwise(biT * biT))

      // weighted degree-1 loess from five explicit folds
      val rho = col("rho")
      val rv = rho * v
      val trend2 =
        if (useKernel)
          // the fit IS the window aggregate (r21): one primitive
          // (ρ, v) frame buffer, eval = the five-fold fit — no boxed
          // collect_list, no intermediate array row; verdict parity is
          // structural (n counts every frame row, nullSeen latches a
          // null input) and StlSpec pins all forms bit-equal
          graft.plans.FrameAggKernels.loessFit(rho, v, w0, w1, w2).over(frame)
        else {
          val s0c = fold(rho, i => wt(i + q))
          val s1c = fold(rho, i => wt(i + q) * i)
          val s2c = fold(rho, i => wt(i + q) * i * i)
          val t0c = fold(rv, i => wt(i + q))
          val t1c = fold(rv, i => wt(i + q) * i)
          val denom = s0c * s2c - s1c * s1c
          when(denom === 0, lit(null)).otherwise((s2c * t0c - s1c * t1c) / denom)
        }
      // materialize the pass-2 fit ONCE: reusing the `trend2` Column in
      // a later stage would re-extract its whole window stack into a
      // second pass-2 Window node (30 offset frames re-evaluated —
      // measured ~2× the query's cost); downstream consumers reference
      // the materialized attribute instead
      val withT2 = withRho
        .withColumn("__t2", trend2)
        .withColumn("__d4", s4(v - col("__t2")))
        .withColumn("__r4", s4(rho))
      val sw = sum(when(col("__d4").isNotNull, col("__d4") * col("__r4"))).over(pw)
      val sr = sum(when(col("__d4").isNotNull, col("__r4"))).over(pw)
      val seas = when(sr.isNull || sr === 0, lit(null))
        .otherwise(sw.cast("double") / sr.cast("double") / lit(10000d))
      cur = withT2
        .withColumn("__seas", seas)
        .withColumn("__ss4", floor(col("__seas") * lit(10000d) + lit(0.5d)).cast("long"))
      o += 1
    }
    cur
      .withColumn("trend_s4", s4(col("__t2")))
      .withColumn("seasonal_s4", col("__ss4"))
      .withColumn("remainder_s4", col("__d4") - col("__ss4"))
      .withColumn("rho_s4", col("__r4"))
      .select(groupCols.map(col) ++ Seq(col(orderCol), v.as("value"), col("phase"),
        col("trend_s4"), col("seasonal_s4"), col("remainder_s4"), col("rho_s4")): _*)
  }

  /** DuckDB twin of [[robustDecompose]] over the daily events spine —
    * the same literal coefficient tables, the same fold order, the
    * same s4 integer space, term for term. `spineCtes` supplies the
    * pb/bounds/spine/j/f chain ending in f(user_id, bucket,
    * filled_value) (the ts_seasonal oracle's spine).
    */
  def oracleSql(spineCtes: String, q: Int, outerIters: Int = 1): String =
    oracleCoreCtes(spineCtes, q, outerIters) + s"""
       |select user_id, bucket, filled_value as value, phase,
       | ${s4Sql("trend2")} as trend_s4,
       | cast(floor(seas * 10000E0 + 0.5E0) as bigint) as seasonal_s4,
       | d4 - cast(floor(seas * 10000E0 + 0.5E0) as bigint) as remainder_s4,
       | r4 as rho_s4
       |from ${lastCte(outerIters)}
       |order by user_id, bucket""".stripMargin

  /** Name of the final per-row CTE for a given outer-iteration count
    * (iteration 1 keeps the historical unsuffixed names).
    */
  private def lastCte(outerIters: Int): String =
    if (outerIters <= 1) "sn2" else s"sn2_$outerIters"

  private def s4Sql(x: String): String = s"cast(floor($x * 10000E0 + 0.5E0) as bigint)"

  /** The oracle's CTE chain up to the last iteration's sn2 (per-row
    * trend2 / d4 / r4 / seas) — shared by [[oracleSql]] and
    * [[strengthOracleSql]]. For `outerIters > 1`, each extra
    * robustness pass appends a suffixed chain (ab_o…sn2_o) that
    * recomputes a4 from the previous pass's (d4, seas) and re-runs
    * the identical weighted fit — mirroring the Scala loop pass for
    * pass.
    */
  def oracleCoreCtes(spineCtes: String, q: Int, outerIters: Int = 1): String = {
    require(outerIters >= 1)
    import OracleGen.litD
    val taps = -q to q
    val c1 = pass1Coefs(q)
    val wt = tricube(q)
    def tapS(c: String, i: Int): String =
      if (i < 0) s"lag($c, ${-i}) over w" else if (i == 0) c else s"lead($c, $i) over w"
    def foldS(c: String, coef: Int => Double): String =
      taps.map(i => s"(${litD(coef(i))} * ${tapS(c, i)})").reduceLeft((a, b) => s"($a + $b)")
    def s4S(x: String): String = s"cast(floor($x * 10000E0 + 0.5E0) as bigint)"
    val trend1 = taps.map(i => s"(${litD(c1(i + q))} * ${tapS("filled_value", i)})")
      .reduceLeft((a, b) => s"($a + $b)")
    val s0c = foldS("rho", i => wt(i + q))
    val s1c = foldS("rho", i => wt(i + q) * i)
    val s2c = foldS("rho", i => wt(i + q) * i * i)
    val t0c = foldS("rv", i => wt(i + q))
    val t1c = foldS("rv", i => wt(i + q) * i)
    s"""$spineCtes,
       |t1 as (select user_id, bucket, filled_value,
       |  cast((bucket // 86400000000 + 3) % 7 as int) as phase,
       |  ${s4S(s"(filled_value - $trend1)")} as m
       | from f window w as (partition by user_id order by bucket)),
       |sn1 as (select *,
       |  cast(sum(m) over pw as double) / cast(count(m) over pw as double) / 10000E0 as s1
       | from t1 window pw as (partition by user_id, phase)),
       |ab as (select *, abs(m - cast(floor(s1 * 10000E0 + 0.5E0) as bigint)) as a4 from sn1),
       |rk as (select *,
       |  row_number() over (partition by user_id order by a4 asc nulls last, bucket) as rn,
       |  count(a4) over (partition by user_id) as cnt
       | from ab),
       |md as (select *,
       |  max(case when rn = (cnt + 1) // 2 then a4 end) over (partition by user_id) as med
       | from rk),
       |rw as (select user_id, bucket, filled_value, phase,
       |  case when a4 is null then 1.0E0
       |       when med is null then 1.0E0
       |       when med * 6 = 0 then 1.0E0
       |       when cast(a4 as double) / cast(med * 6 as double) >= 1.0E0 then 0.0E0
       |       else (1.0E0 - (cast(a4 as double) / cast(med * 6 as double)) * (cast(a4 as double) / cast(med * 6 as double)))
       |            * (1.0E0 - (cast(a4 as double) / cast(med * 6 as double)) * (cast(a4 as double) / cast(med * 6 as double)))
       |  end as rho
       | from md),
       |p2 as (select *, rho * filled_value as rv from rw),
       |t2 as (select user_id, bucket, filled_value, phase, rho,
       |  case when ($s0c * $s2c - $s1c * $s1c) = 0 then null
       |       else (($s2c * $t0c - $s1c * $t1c) / ($s0c * $s2c - $s1c * $s1c)) end as trend2
       | from p2 window w as (partition by user_id order by bucket)),
       |q2 as (select *, ${s4S("(filled_value - trend2)")} as d4, ${s4S("rho")} as r4 from t2),
       |sn2 as (select *,
       |  case when sum(case when d4 is not null then r4 end) over pw is null
       |         or sum(case when d4 is not null then r4 end) over pw = 0 then null
       |       else cast(sum(case when d4 is not null then d4 * r4 end) over pw as double)
       |            / cast(sum(case when d4 is not null then r4 end) over pw as double) / 10000E0
       |  end as seas
       | from q2 window pw as (partition by user_id, phase))""".stripMargin +
      // extra outer robustness passes: each recomputes a4 from the
      // previous pass's (d4, seas) and replays the identical weighted
      // chain under suffixed CTE names — mirroring the Scala loop
      (2 to outerIters).map { o =>
        val prev = if (o == 2) "sn2" else s"sn2_${o - 1}"
        val rhoCase =
          """case when a4 is null then 1.0E0
            |       when med is null then 1.0E0
            |       when med * 6 = 0 then 1.0E0
            |       when cast(a4 as double) / cast(med * 6 as double) >= 1.0E0 then 0.0E0
            |       else (1.0E0 - (cast(a4 as double) / cast(med * 6 as double)) * (cast(a4 as double) / cast(med * 6 as double)))
            |            * (1.0E0 - (cast(a4 as double) / cast(med * 6 as double)) * (cast(a4 as double) / cast(med * 6 as double)))
            |  end""".stripMargin
        s""",
           |ab_$o as (select user_id, bucket, filled_value, phase, d4,
           |  abs(d4 - cast(floor(seas * 10000E0 + 0.5E0) as bigint)) as a4
           | from $prev),
           |rk_$o as (select *,
           |  row_number() over (partition by user_id order by a4 asc nulls last, bucket) as rn,
           |  count(a4) over (partition by user_id) as cnt
           | from ab_$o),
           |md_$o as (select *,
           |  max(case when rn = (cnt + 1) // 2 then a4 end) over (partition by user_id) as med
           | from rk_$o),
           |rw_$o as (select user_id, bucket, filled_value, phase,
           |  $rhoCase as rho
           | from md_$o),
           |p2_$o as (select *, rho * filled_value as rv from rw_$o),
           |t2_$o as (select user_id, bucket, filled_value, phase, rho,
           |  case when ($s0c * $s2c - $s1c * $s1c) = 0 then null
           |       else (($s2c * $t0c - $s1c * $t1c) / ($s0c * $s2c - $s1c * $s1c)) end as trend2
           | from p2_$o window w as (partition by user_id order by bucket)),
           |q2_$o as (select *, ${s4S("(filled_value - trend2)")} as d4, ${s4S("rho")} as r4 from t2_$o),
           |sn2_$o as (select *,
           |  case when sum(case when d4 is not null then r4 end) over pw is null
           |         or sum(case when d4 is not null then r4 end) over pw = 0 then null
           |       else cast(sum(case when d4 is not null then d4 * r4 end) over pw as double)
           |            / cast(sum(case when d4 is not null then r4 end) over pw as double) / 10000E0
           |  end as seas
           | from q2_$o window pw as (partition by user_id, phase))""".stripMargin
      }.mkString
  }

  /** DuckDB twin of [[strength]] over the [[oracleCoreCtes]] chain:
    * the same s4 component integers, the same exact integer variance
    * numerators (DuckDB sums BIGINT→HUGEINT where Spark sums
    * decimal(38,0) — both exact, both cast-to-double correctly
    * rounded from the identical integer), the same clamp/round.
    */
  def strengthOracleSql(spineCtes: String, q: Int, outerIters: Int = 1): String =
    oracleCoreCtes(spineCtes, q, outerIters) + s""",
       |comp as (select user_id,
       |   d4 - ${s4Sql("seas")} as r,
       |   ${s4Sql("trend2")} + (d4 - ${s4Sql("seas")}) as y,
       |   ${s4Sql("seas")} + (d4 - ${s4Sql("seas")}) as z
       | from ${lastCte(outerIters)}
       | where trend2 is not null and seas is not null and d4 is not null),
       |ag as (select user_id, cast(count(*) as bigint) as n,
       |   sum(r) as sr, sum(r * r) as srr,
       |   sum(y) as sy, sum(y * y) as syy,
       |   sum(z) as sz, sum(z * z) as szz
       | from comp group by user_id)
       |select user_id, n,
       | case when n * syy - sy * sy = 0 then null
       |      else round(greatest(0.0E0,
       |        1.0E0 - cast(n * srr - sr * sr as double)
       |              / cast(n * syy - sy * sy as double)), 4) end as f_trend,
       | case when n * szz - sz * sz = 0 then null
       |      else round(greatest(0.0E0,
       |        1.0E0 - cast(n * srr - sr * sr as double)
       |              / cast(n * szz - sz * sz as double)), 4) end as f_seasonal
       |from ag
       |order by user_id""".stripMargin

  /** STL strength-of-components diagnostics (the tsfeatures /
    * Hyndman-Athanasopoulos FPP metrics) from a [[robustDecompose]]
    * output: F_trend = max(0, 1 − Var(R)/Var(T+R)) and
    * F_seasonal = max(0, 1 − Var(R)/Var(S+R)), per series, over rows
    * where every component is defined. Exactness: variances are
    * computed as the INTEGER numerators n·Σx² − (Σx)² of the s4
    * component longs — per-row squares stay in int64 (|x| ≤ 3·10⁹
    * documented bound), the n-scaled sums ride exact decimal(38,0)
    * aggregation (the q_rollup lesson: association-free, matching
    * DuckDB's HUGEINT) — the shared n·… factors cancel in the ratio,
    * and both engines divide the identical correctly-rounded doubles.
    * ONE partial-agg groupBy on the series key; map-side combinable.
    */
  def strength(decomposed: DataFrame, groupCols: Seq[String]): DataFrame = {
    val ok = decomposed.where(
      col("trend_s4").isNotNull && col("seasonal_s4").isNotNull &&
        col("remainder_s4").isNotNull)
    val r = col("remainder_s4")
    val y = col("trend_s4") + col("remainder_s4")
    val z = col("seasonal_s4") + col("remainder_s4")
    def dsum(c: Column): Column = sum(c.cast("decimal(38,0)"))
    val agg = ok.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      dsum(r).as("__sr"), dsum(r * r).as("__srr"),
      dsum(y).as("__sy"), dsum(y * y).as("__syy"),
      dsum(z).as("__sz"), dsum(z * z).as("__szz"))
    val n = col("n").cast("decimal(38,0)")
    val num = n * col("__srr") - col("__sr") * col("__sr")
    def f(syy: Column, sy: Column): Column = {
      val den = n * syy - sy * sy
      when(den === 0, lit(null)).otherwise(
        round(greatest(lit(0.0),
          lit(1.0) - num.cast("double") / den.cast("double")), 4))
    }
    agg.select(groupCols.map(col) ++ Seq(col("n"),
      f(col("__syy"), col("__sy")).as("f_trend"),
      f(col("__szz"), col("__sz")).as("f_seasonal")): _*)
  }
}
