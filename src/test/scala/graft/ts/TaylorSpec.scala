package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Validates Taylor.windowedTaylorCoefs against outputs of the
  * reference implementation (taylor_coefs_one_column_grp run on
  * y_t = t + sin(t), t = 0..11; reference values captured at 6dp).
  */
class TaylorSpec extends SparkSpec {
  import spark.implicits._

  private def series(grp: Int) = (0 until 12).map(t => (grp, t, t + math.sin(t)))

  // two identical groups: results must be per-group, not global
  private lazy val df = (series(1) ++ series(2)).toDF("g", "t", "y")

  private def run(degree: Int, w: Int, align: String, ew: Option[Int], fill: Boolean) = {
    val res = Taylor.windowedTaylorCoefs(df, Seq("y"), Seq("g"), Seq("t"), degree, Seq(w), Seq(align), Seq(ew), fill)
    val names = res.featureNames
    val rows = res.df.filter($"g" === 2).orderBy("t")
      .select(names.map(col): _*).collect()
    names.indices.map(i => rows.map(r => if (r.isNullAt(i)) None else Some(r.getDouble(i))).toSeq)
  }

  test("trailing w=5 d=1 fill_edges=true matches reference") {
    val Seq(c0, c1) = run(1, 5, "trailing", None, fill = true)
    assertApprox(c0, Seq(0.000000, 1.841471, 2.909297, 3.280454, 3.449322, 3.981854,
      5.115561, 7.062417, 8.951887, 9.966197, 10.092189, 10.133424).map(Some(_)), 1e-5, "c0")
    assertApprox(c1, Seq(0.000000, 0.000000, 1.067826, 0.649825, 0.443700, 0.473311,
      0.652253, 1.150912, 1.510823, 1.401086, 0.922592, 0.515267).map(Some(_)), 1e-5, "c1")
  }

  test("centered w=5 d=1 fill_edges=true matches reference (incl. never-filled pos n-h-1)") {
    val Seq(c0, c1) = run(1, 5, "centered", None, fill = true)
    val e0 = Seq(Some(0.128941), Some(1.448413), Some(2.227017), Some(3.035232), Some(3.811055),
      Some(4.760593), Some(5.930241), Some(7.164025), Some(8.247005), None, Some(9.618157), Some(9.916648))
    val e1 = Seq(Some(1.454649), Some(1.049119), Some(0.778604), Some(0.473311), Some(0.652253),
      Some(1.150912), Some(1.510823), Some(1.401086), Some(0.922592), None, Some(0.307582), Some(0.293946))
    assertApprox(c0, e0, 1e-5, "c0")
    assertApprox(c1, e1, 1e-5, "c1")
  }

  test("centered w=5 d=1 ew_span=4 fill_edges=false matches reference") {
    val Seq(c0, c1) = run(1, 5, "centered", Some(4), fill = false)
    val e0 = Seq(None, None, Some(2.476264), Some(3.073915), Some(3.603609), Some(4.497743),
      Some(5.853650), Some(7.344111), Some(8.518197), None, None, None)
    val e1 = Seq(None, None, Some(0.758000), Some(0.424293), Some(0.619889), Some(1.164957),
      Some(1.558364), Some(1.438414), Some(0.915388), None, None, None)
    assertApprox(c0, e0, 1e-5, "c0")
    assertApprox(c1, e1, 1e-5, "c1")
  }

  test("trailing fill_edges=false: first w rows null, rest filled (reference test shape)") {
    val Seq(c0, _, _) = run(2, 5, "trailing", None, fill = false)
    assert(c0.take(5).forall(_.isEmpty))
    assert(c0.drop(5).forall(_.nonEmpty))
  }
}
