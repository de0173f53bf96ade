package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins Profile.quantilesContBy — the r14 bounded-state default route
  * for q_quantiles — BIT-FOR-BIT against the unbounded exact
  * `percentile()` aggregate it replaces
  * (Profile.quantilesContExactPercentileTwin). The radix route selects
  * the two bracketing order statistics per (group, pct) and applies
  * Spark Percentile's own interpolation `(hi−pos)·v_lo +
  * (pos−lo)·v_hi`, so equality is exact, not approximate.
  */
class QuantilesContSpec extends SparkSpec {
  import spark.implicits._

  private val pcts = Seq(("q25", 0.25), ("q50", 0.5), ("q75", 0.75), ("q95", 0.95))

  private def bits(d: Double): Long = java.lang.Double.doubleToLongBits(d)

  private def compare(df: org.apache.spark.sql.DataFrame, clue: String): Unit = {
    val got = Profile.quantilesContBy(df, "g", col("v"), pcts)
      .collect().map(r => r.getString(0) -> r).toMap
    val exp = Profile.quantilesContExactPercentileTwin(df, "g", "v", pcts)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == exp.keySet, s"$clue: group sets differ")
    for (g <- exp.keySet; i <- pcts.indices) {
      (got(g).isNullAt(i + 1), exp(g).isNullAt(i + 1)) match {
        case (true, true) => ()
        case (false, false) =>
          assert(bits(got(g).getDouble(i + 1)) == bits(exp(g).getDouble(i + 1)),
            s"$clue group $g pct ${pcts(i)._1}: " +
              s"${got(g).getDouble(i + 1)} vs ${exp(g).getDouble(i + 1)}")
        case (a, b) => fail(s"$clue group $g pct ${pcts(i)._1}: null mismatch $a/$b")
      }
      assert(got(g).getLong(pcts.size + 1) == exp(g).getLong(pcts.size + 1),
        s"$clue group $g: n mismatch")
    }
  }

  test("bit-identical to the percentile() twin on adversarial grouped doubles") {
    val rnd = new scala.util.Random(4242)
    val rows: Seq[(String, Option[Double])] = (0 until 2400).map { i =>
      val v: Option[Double] = rnd.nextInt(7) match {
        case 0 => Some(-math.exp(rnd.nextDouble() * 180 - 90))
        case 1 => Some(math.exp(rnd.nextDouble() * 180 - 90))
        case 2 => Some(rnd.nextInt(8).toDouble) // heavy duplication
        case 3 => Some(-0.0)
        case 4 => Some(rnd.nextDouble() * 4.9e-300)
        case 5 => None // percentile ignores nulls; n counts them
        case _ => Some(0.0)
      }
      ("g" + (i % 5), v)
    } :+ (("allnull", Option.empty[Double])) :+ (("single", Some(3.25)))
    compare(rows.toDF("g", "v"), "adversarial")
  }

  test("equal-keys short-circuit: duplicated NON-DYADIC values at fractional positions") {
    // When both bracketing order statistics are the same value v at a
    // fractional position, Spark Percentile returns v verbatim;
    // interpolating (hi−pos)·v + (pos−lo)·v instead differs by 1 ulp
    // for ~3.5 % of (v, pos) pairs (ADVICE r15). Non-dyadic duplicated
    // values (0.1, 0.3, …) at group sizes that put every pct at a
    // fractional pos make the divergence deterministic, not sampled.
    // DETERMINISTIC divergent cases: constant groups at (n, v) combos
    // where (hi−pos)·v + (pos−lo)·v ≠ v in IEEE double — for q95,
    // pos = 0.95·(n−1): (n=7, v=0.9), (n=5, v=7.7), (n=10, v=7.7)
    // all flip the last bit, so the old interpolate-always code FAILS
    // this test (verified against doubleToLongBits off-line)
    val constant: Seq[(String, Option[Double])] =
      Seq((7, 0.9), (5, 7.7), (10, 7.7)).zipWithIndex.flatMap {
        case ((n, v), gi) => (0 until n).map(_ => ("c" + gi, Some(v)))
      }
    // plus randomized heavy-duplication groups over non-dyadic values
    val rnd = new scala.util.Random(1717)
    val vals = Array(0.1, 0.3, 0.7, 1.0 / 3.0, 2.0 / 7.0, -0.1, 9.4, 7.7, 0.9)
    val random: Seq[(String, Option[Double])] = (for {
      (n, gi) <- Seq(7, 11, 13, 22, 46).zipWithIndex
      i <- 0 until n
    } yield ("d" + gi, Some(vals(rnd.nextInt(3) match {
      case 0 => gi % vals.length // heavy duplication of one value
      case _ => rnd.nextInt(vals.length)
    }))))
    compare((constant ++ random).toDF("g", "v"), "dup-nondyadic")
  }

  test("NaN and −0.0 adversarial values (KernelRuntime canonicalization)") {
    // NaN canonicalizes (doubleToLongBits) to ONE key above +∞ in
    // SortableDoubleBits — matching percentile()'s boxed-Double
    // dedup/ordering where every NaN payload is one entry sorting
    // last; −0.0 keys just below +0.0 and must NOT be conflated with
    // it (boxed equals distinguishes them, so the twin interpolates).
    val rnd = new scala.util.Random(9090)
    val rows: Seq[(String, Option[Double])] = (0 until 900).map { i =>
      val v: Option[Double] = rnd.nextInt(6) match {
        case 0 => Some(Double.NaN)
        case 1 => Some(java.lang.Double.longBitsToDouble(0xFFF8000000000123L)) // payload NaN
        case 2 => Some(-0.0)
        case 3 => Some(0.0)
        case 4 => Some(Double.PositiveInfinity)
        case _ => Some(rnd.nextDouble() - 0.5)
      }
      ("n" + (i % 4), v)
    } :+ (("allnan", Some(Double.NaN)))
    compare(rows.toDF("g", "v"), "nan-negzero")
  }

  test("out-of-range percentiles rejected up front, not as a corrupt-histogram error") {
    val rows = Seq(("g0", 1.0), ("g0", 2.0))
    val e = intercept[IllegalArgumentException] {
      Profile.quantilesContBy(rows.toDF("g", "v"), "g", col("v"), Seq(("bad", 1.5)))
    }
    assert(e.getMessage.contains("percentage out of [0, 1]"))
  }

  test("bit-identical to the twin on sf0.001 events (the q_quantiles shape)") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_type").as("g"), col("value").as("v"))
    compare(ev, "events")
  }

  test("group cap enforced") {
    val rows = (0 until 600).map(i => ("g" + i, i.toDouble))
    val e = intercept[IllegalArgumentException] {
      Profile.quantilesContBy(rows.toDF("g", "v"), "g", col("v"), pcts, maxGroups = 100)
    }
    assert(e.getMessage.contains("exceed the driver-bounded limit"))
  }

  test("single source scan: group sizes ride the persisted projection (judge r16)") {
    // The r16 shape re-read the parquet for the null-inclusive group
    // counts — a second full FileScan in the default q_quantiles
    // route. Pin the fix with LOCAL-FS byte accounting (tests run
    // sequentially in one forked JVM): the radix route must read at
    // most ~1 source-scan's worth of bytes more than a plain one-scan
    // aggregate over the same two columns. Cached radix rounds read
    // memory, not the file, so a reintroduced second scan shows up as
    // ~2x the baseline delta.
    val stats = org.apache.hadoop.fs.FileSystem.getGlobalStorageStatistics.get("file")
    def scanBytes(work: => Unit): Long = {
      val before = stats.getLong("bytesRead")
      work
      stats.getLong("bytesRead") - before
    }
    val src = "/root/testdata/sf0.001/events.parquet"
    def ev = spark.read.parquet(src)
      .select(col("event_type").as("g"), col("value").as("v"))
    // warm footer/listing caches so both measurements see the same fixed costs
    ev.where(col("g").isNotNull).groupBy("g").agg(count(lit(1))).collect()
    val base = scanBytes {
      ev.where(col("g").isNotNull).groupBy("g").agg(count(lit(1)), count(col("v"))).collect()
    }
    val quant = scanBytes {
      Profile.quantilesContBy(ev, "g", col("v"), pcts).collect()
    }
    assert(base > 0, s"baseline scan read nothing? base=$base")
    assert(quant < (1.6 * base).toLong,
      s"quantilesContBy read ${quant}B vs one-scan baseline ${base}B — second source scan reintroduced?")
  }
}
