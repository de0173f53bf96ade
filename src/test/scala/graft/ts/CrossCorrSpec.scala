package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

class CrossCorrSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = {
    val rnd = new scala.util.Random(3)
    (for (g <- 0 until 3; t <- 0 until 80)
      yield (g, t, math.sin(t * 0.2) + rnd.nextDouble() * 0.3,
        math.sin(t * 0.2 + 0.4) + rnd.nextDouble() * 0.3))
      .toDF("g", "t", "v", "u")
  }

  test("crossCorr equals the declarative SHIFTED-Pearson expression form") {
    // r16: the five-raw-sums reference was replaced by the shifted
    // (centered) form everywhere — see KernelRuntime mode 4
    val w = 10
    val win = Featurize.seriesWindow(Seq("g"), Seq("t"))
    def x(i: Int): Column = if (i == 0) $"v" else lag($"v", i).over(win)
    def y(i: Int): Column = if (i == 0) $"u" else lag($"u", i).over(win)
    def pair(i: Int): Column = x(i).isNotNull && y(i).isNotNull
    def fold(f: Int => Column): Column = (0 until w).map(f).reduceLeft(_ + _)
    val n = fold(i => when(pair(i), 1).otherwise(0))
    val nd = n.cast("double")
    val sx = fold(i => when(pair(i), x(i).cast("double")).otherwise(lit(0.0)))
    val sy = fold(i => when(pair(i), y(i).cast("double")).otherwise(lit(0.0)))
    val mx = sx / nd
    val my = sy / nd
    val sxxc = fold(i => when(pair(i),
      (x(i).cast("double") - mx) * (x(i).cast("double") - mx)).otherwise(lit(0.0)))
    val syyc = fold(i => when(pair(i),
      (y(i).cast("double") - my) * (y(i).cast("double") - my)).otherwise(lit(0.0)))
    val sxyc = fold(i => when(pair(i),
      (x(i).cast("double") - mx) * (y(i).cast("double") - my)).otherwise(lit(0.0)))
    val r = sxyc / sqrt(sxxc * syyc)
    val decl = df.withColumn("expected", when(n >= w, r))
      .select($"g", $"t", $"expected").orderBy("g", "t").collect()
      .map(r0 => if (r0.isNullAt(2)) None else Some(r0.getDouble(2))).toSeq
    val res = Featurize.crossCorr(df, "v", "u", Seq("g"), Seq("t"), w)
    val got = res.df.select($"g", $"t", col(res.featureNames.head)).orderBy("g", "t").collect()
      .map(r0 => if (r0.isNullAt(2)) None else Some(r0.getDouble(2))).toSeq
    assert(got == decl)
    // correlated-by-construction series: interior windows mostly positive
    val vals = got.flatten
    assert(vals.nonEmpty && vals.count(_ > 0) > vals.size / 2)
  }

  test("crossCorr with a null-holed column gates on complete pairs") {
    val holed = df.withColumn("u", when($"t" % 9 === 0, lit(null)).otherwise($"u"))
    val res = Featurize.crossCorr(holed, "v", "u", Seq("g"), Seq("t"), 5)
    // a window containing a null pair has < w complete pairs -> null
    val out = res.df.where($"t" >= 4 && $"t" % 9 === 0).select(col(res.featureNames.head))
    assert(out.collect().forall(_.isNullAt(0)))
  }
}
