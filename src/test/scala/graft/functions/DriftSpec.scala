package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PSI corpus-drift monitor: the integer log2 bin ladder, the exact
  * per-bin fractions and PSI terms against hand arithmetic, one-sided
  * bins contributing null (not ε noise), and the running PSI in
  * pinned bin order.
  */
class DriftSpec extends SparkSpec {

  test("log2 bin ladder: boundaries land exactly where the contract says") {
    val s = spark
    import s.implicits._
    val vals = Seq(0L, 1L, 2L, 3L, 4L, 7L, 8L, 255L, 256L, 16383L, 16384L, 32767L, 32768L, 1000000L)
    val exp = Seq(0, 0, 1, 1, 2, 2, 3, 7, 8, 13, 14, 14, 15, 15)
    val out = vals.toDF("v").select(expr(Drift.logBinSql("v")).as("bin"))
      .collect().map(_.getInt(0)).toSeq
    assert(out == exp)
  }

  test("PSI terms and the running total match hand arithmetic") {
    val s = spark
    import s.implicits._
    // even ids (ref): 4 docs in bin 3 (v=8..15), 4 in bin 4 (16..31)
    // odd ids (cand): 2 docs in bin 3, 6 in bin 4 → known fracs
    val rows =
      (0 until 4).map(i => (2L * i, 9L)) ++ (0 until 4).map(i => (2L * i + 8, 17L)) ++
        (0 until 2).map(i => (2L * i + 1, 9L)) ++ (0 until 6).map(i => (2L * i + 5, 17L))
    val df = rows.toDF("doc_id", "v")
    val out = Drift.corpusDrift(df, "doc_id", "v").orderBy("bin").collect()
    assert(out.length == 2)
    val b3 = out(0); val b4 = out(1)
    assert(b3.getInt(0) == 3 && b3.getLong(1) == 4L && b3.getLong(2) == 2L)
    assert(b3.getDouble(3) == 0.5 && b3.getDouble(4) == 0.25)
    val t3 = BigDecimal((0.25 - 0.5) * math.log(0.25 / 0.5))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val t4 = BigDecimal((0.75 - 0.5) * math.log(0.75 / 0.5))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(b3.getDouble(5) - t3) < 1e-12, s"psi term bin3 ${b3.getDouble(5)} vs $t3")
    assert(math.abs(b4.getDouble(5) - t4) < 1e-12)
    assert(math.abs(b4.getDouble(6) - (b3.getDouble(5) + b4.getDouble(5))) < 1e-12,
      "psi_cum last row is the corpus PSI")
  }

  test("a one-sided bin contributes a null term and is skipped by the running sum") {
    val s = spark
    import s.implicits._
    val rows = Seq((0L, 9L), (2L, 9L), (1L, 9L), (3L, 17L)) // bin 4 is cand-only
    val out = Drift.corpusDrift(rows.toDF("doc_id", "v"), "doc_id", "v")
      .orderBy("bin").collect()
    assert(out.length == 2)
    assert(out(1).isNullAt(5), "cand-only bin: null term")
    assert(out(1).getDouble(6) == out(0).getDouble(6),
      "running PSI carries past the null bin unchanged")
  }

  test("identical halves give PSI exactly 0 on every row") {
    val s = spark
    import s.implicits._
    val rows = (0 until 40).map(i => (i.toLong, (16 + (i / 2 % 4) * 30).toLong))
    val out = Drift.corpusDrift(rows.toDF("doc_id", "v"), "doc_id", "v").collect()
    out.foreach { r =>
      assert(r.getDouble(5) == 0.0 && !(1.0 / r.getDouble(5) < 0), "term is +0.0")
      assert(r.getDouble(6) == 0.0)
    }
  }
}
