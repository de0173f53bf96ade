package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The exact small-n Mann-Kendall permutation table (ts_mannkendall_exact).
  *
  * The table itself is pinned three independent ways: literal
  * enumeration of every permutation for n = 3..8 (the DP must match
  * brute force exactly), DP-independent closed forms at the tail
  * (only the identity permutation reaches S = n(n−1)/2; exactly n−1
  * single-inversion permutations reach S = n(n−1)/2 − 2), and the
  * classic published value P(S ≥ 4 | n = 4) = 4/24. The end-to-end
  * test drives mannKendallExact through Spark, including every null
  * branch (ties, n < 3, n > 10) and the S = 0 → p = 1 case.
  */
class MannKendallExactSpec extends SparkSpec {

  private def bruteTails(n: Int): Map[Int, Long] = {
    val maxS = n * (n - 1) / 2
    val sCounts = new scala.collection.mutable.HashMap[Int, Long]().withDefaultValue(0L)
    (1 to n).permutations.foreach { p =>
      var s = 0
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) {
          s += Integer.signum(p(j) - p(i))
          j += 1
        }
        i += 1
      }
      sCounts(s) += 1L
    }
    (1 to maxS).map(s => s -> sCounts.filter(_._1 >= s).values.sum).toMap
  }

  test("DP tail counts equal literal permutation enumeration for n = 3..8") {
    (3 to 8).foreach { n =>
      assert(TimeOps.mkExactTailCounts(n) == bruteTails(n), s"n=$n")
    }
  }

  test("closed-form tail pins hold through n = 10 (beyond enumeration reach)") {
    (3 to 10).foreach { n =>
      val tails = TimeOps.mkExactTailCounts(n)
      val maxS = n * (n - 1) / 2
      assert(tails(maxS) == 1L, s"n=$n: only the identity reaches max S")
      assert(tails(maxS - 2) == n.toLong,
        s"n=$n: identity + (n-1) single-inversion permutations reach maxS-2")
      // published classic value (Gilbert's exact table): P(S>=4 | n=4) = 4/24
      if (n == 4) assert(tails(4) == 4L)
    }
  }

  test("tail counts are monotone non-increasing in s and bounded by n!") {
    (3 to 10).foreach { n =>
      val tails = TimeOps.mkExactTailCounts(n)
      val fact = (1 to n).map(_.toLong).product
      val maxS = n * (n - 1) / 2
      var prev = fact
      (1 to maxS).foreach { s =>
        assert(tails(s) <= prev, s"n=$n s=$s monotone")
        prev = tails(s)
      }
      // symmetry: P(S >= 1)·2 + P(S = 0)·n! = n! — i.e. the positive
      // tail is (n! − #{S=0})/2; #{S=0} = n! − 2·tails(1)
      val zeroCount = fact - 2 * tails(1)
      assert(zeroCount >= 0, s"n=$n zero count")
      assert((maxS % 2 == 0) == (zeroCount > 0),
        s"n=$n: S=0 is reachable iff n(n-1)/2 is even")
    }
  }

  test("end-to-end: exact p on untied small series, null on ties/out-of-range, 1 at S=0") {
    val s = spark
    import s.implicits._
    val rows =
      // user 1: n=5 strictly increasing → S=10, p = 2·1/120
      (1 to 5).map(i => (1L, i.toLong * 1000L, i.toDouble)) ++
        // user 2: n=5 with one value tie → p_exact null (tie_adj > 0)
        Seq((2L, 1000L, 1.0), (2L, 2000L, 2.0), (2L, 3000L, 2.0), (2L, 4000L, 3.0), (2L, 5000L, 4.0)) ++
        // user 3: n=12 → beyond the table → null
        (1 to 12).map(i => (3L, i.toLong * 1000L, i.toDouble * 2)) ++
        // user 4: n=4 arranged to S=0 → p = 1.0
        Seq((4L, 1000L, 3.0), (4L, 2000L, 1.0), (4L, 3000L, 4.0), (4L, 4000L, 2.0)) ++
        // user 5: n=2 → below the table → null
        Seq((5L, 1000L, 1.0), (5L, 2000L, 2.0)) ++
        // user 6: n=4 one descending swap (S=4 is NOT reachable… S ∈
        // {6,4,2,0,…}; swap adjacent: S=4) → p = 2·4/24
        Seq((6L, 1000L, 2.0), (6L, 2000L, 1.0), (6L, 3000L, 3.0), (6L, 4000L, 4.0))
    val df = rows.toDF("user_id", "ts_us", "value")
    val out = TimeOps.mannKendallExact(df, "value", "ts_us", Seq("user_id"))
      .orderBy("user_id")
      .select($"user_id", $"s_stat", $"p_exact")
      .collect()
    val byUser = out.map(r => r.getLong(0) ->
      (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(byUser(1L) == ((10L, Some(2.0 * 1 / 120.0))))
    assert(byUser(2L)._2.isEmpty, "value tie must null the exact p")
    assert(byUser(3L)._2.isEmpty, "n=12 is beyond the table")
    assert(byUser(4L) == ((0L, Some(1.0))))
    assert(byUser(5L)._2.isEmpty, "n=2 is below the table")
    assert(byUser(6L) == ((4L, Some(2.0 * 4 / 24.0))))
  }
}
