package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

import graft.ts.TimeOps

/** House rule for every float-emitting shared/oracle expression
  * (r20, judge item 1): `round(…, 4) + 0.0E0` — DuckDB's round()
  * PRESERVES the sign of zero (round(-1e-9, 4) → -0.0) while Spark's
  * BigDecimal path normalizes to +0.0, so any rounded value landing
  * in (-5e-5, 0] bit-diverges under the driver's hash gate even
  * though `==` compares equal (the r19 red rows: stream_perm_entropy,
  * real_ts_anomaly). The trailing `+ 0.0E0` maps -0.0 → +0.0
  * identically on both engines and is an exact identity for every
  * other double. This spec pins the Spark half of the contract: the
  * shared texts emit POSITIVE zero bits for the boundary inputs (the
  * DuckDB half is exercised by the bit-exact gate,
  * tools/compare.py --bitexact).
  */
class SignedZeroSpec extends SparkSpec {
  import spark.implicits._

  private val posZero = java.lang.Double.doubleToRawLongBits(0.0)

  private def bitsOf(df: org.apache.spark.sql.DataFrame, c: String): Long =
    java.lang.Double.doubleToRawLongBits(df.select(col(c)).collect()(0).getDouble(0))

  test("PermEntropySql emits +0.0 for a fully-concentrated pattern distribution") {
    // every triple in one pattern: H = -(1·ln 1)/ln 6 = -(0.0) → the
    // un-canonicalized text yields -0.0 (the r19 stream_perm_entropy bug)
    val g = Seq((5L, 0L, 0L, 0L, 0L, 0L, 5L)).toDF("c0", "c1", "c2", "c3", "c4", "c5", "m")
    val out = g.select(expr(TimeOps.PermEntropySql).as("h"))
    assert(bitsOf(out, "h") == posZero, "perm entropy of a constant-pattern series must be +0.0")
  }

  test("rounded tiny-negative statistics canonicalize to +0.0 (OLS slope, ACF-shaped round)") {
    // slope = cov/vx = -1e-9: DuckDB's round would preserve -0.0; the
    // shared text must add it away on the Spark side too
    val sums = Seq((4.0, 0.0, 0.0, 1.0e9, 1.0, -1.0)).toDF("k", "sx", "sy", "sxx", "syy", "sxy")
    // k*sxy - sx*sy = -4, k*sxx - sx*sx = 4e9 → slope = -1e-9 → round → ±0
    val slope = sums.select(expr(SqlTwins.OlsFitSqls("slope")).as("s"))
    assert(bitsOf(slope, "s") == posZero, "tiny-negative slope must round to +0.0")
    // the generic shape: round(x, 4) + 0.0E0 for x in (-5e-5, 0)
    val generic = Seq(Tuple1(-1.0e-9)).toDF("x").select(expr("round(x, 4) + 0.0E0").as("r"))
    assert(bitsOf(generic, "r") == posZero)
  }

  test("KPSS HAC eta and Pettitt p carry the canonicalization (shared-text audit)") {
    // every rounded shared text must end in the trailing add — a new
    // statistic that forgets it re-opens the r19 class silently
    val texts = Seq(
      "PermEntropySql" -> TimeOps.PermEntropySql,
      "PettittPSql" -> TimeOps.PettittPSql,
      "KpssEtaSql" -> TimeOps.KpssEtaSql,
      "KpssHacEtaSql" -> TimeOps.KpssHacEtaSql(16),
      "AdfStatSqls.beta" -> TimeOps.AdfStatSqls("beta"),
      "AdfStatSqls.t_stat" -> TimeOps.AdfStatSqls("t_stat"),
      "OlsFitSqls.slope" -> SqlTwins.OlsFitSqls("slope"),
      "OlsFitSqls.intercept" -> SqlTwins.OlsFitSqls("intercept"),
      "OlsFitSqls.r2" -> SqlTwins.OlsFitSqls("r2"))
    val missing = texts.collect {
      case (name, t) if !"""round\([\s\S]*?, 4\)\s*\+\s*0\.0E0""".r
        .findFirstIn(t).isDefined => name
    }
    assert(missing.isEmpty,
      s"rounded shared texts missing the + 0.0E0 canonicalization: ${missing.mkString(", ")}")
  }
}
