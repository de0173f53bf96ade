package graft.tools

/** Prints every registered query name, one per line — the
  * programmatic side of the SURVEY §2 bold-row == queries-key
  * cross-check (diff against the §2 `**name**` extraction).
  */
object DumpNames {
  def main(args: Array[String]): Unit = {
    graft.SparkEntry.queries.keys.toSeq.sorted.foreach(println)
  }
}
