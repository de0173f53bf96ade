package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF term scoring over a document corpus — the standard
  * "distinctive terms" primitive for curation/topic triage (which
  * terms characterize this document against the corpus).
  *
  * Scale shape: ONE tokenize pass (NormalizeKernel) → per-(doc, term)
  * counts partial-aggregate before their exchange; the document
  * frequency table aggregates on the term key (vocabulary-sized, the
  * standard word-count shuffle); N rides a broadcast 1-row aggregate.
  * The final per-doc top-k is a row_number window that gets Spark's
  * WindowGroupLimit rank pushdown — partial top-k before the exchange.
  * No driver-side materialization anywhere.
  */
object TfIdf {

  /** Top-`k` TF-IDF terms per document: tfidf = tf · ln(N / df),
    * rounded to 4dp (engine ln differs in the last ulp — the DuckDB
    * twin rounds identically), ranked by (tfidf desc, term) for a
    * deterministic verdict.
    */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val toks = docs.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("term"))
      .where(col("term") =!= "")
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("__n"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf").cast("double") *
          log(col("__n").cast("double") / col("df").cast("double")), 4))
    val w = Window.partitionBy(col(idCol)).orderBy(col("tfidf").desc, col("term"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("tf"), col("df"), col("tfidf"))
  }
}
