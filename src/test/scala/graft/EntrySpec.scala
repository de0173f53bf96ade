package graft

/** Mirrors the driver's flagship smoke check: `SparkEntry.entry` must
  * produce rows on the sf0.001 tables. Keeps the entry wiring (query
  * name + data dir) from silently rotting between rounds.
  */
class EntrySpec extends SparkSpec {
  test("entry produces rows on sf0.001 (driver smoke contract)") {
    val n = SparkEntry.entry(spark).limit(5).count()
    assert(n > 0, "entry must return rows")
  }
}
