package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  def assertApprox(got: Seq[Option[Double]], exp: Seq[Option[Double]], tol: Double, clue: String): Unit = {
    assert(got.length == exp.length, s"$clue: length ${got.length} != ${exp.length}")
    got.zip(exp).zipWithIndex.foreach {
      case ((Some(g), Some(e)), i) => assert(math.abs(g - e) <= tol, s"$clue[$i]: got $g expected $e")
      case ((None, None), _)       => ()
      case ((g, e), i)             => fail(s"$clue[$i]: got $g expected $e")
    }
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
