package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sparse (token-space) cosine similarity join: tf vectors meet only on
  * shared terms (postings self-join), dot products and squared norms in
  * EXACT integer arithmetic, cosine as one final double op.
  *
  * Scale notes: per-term join cost is df(t)² — dominated by stop-like
  * terms that carry no discriminative signal. `maxDf` drops terms whose
  * document frequency exceeds the threshold BEFORE the self-join (the
  * standard cut; idf ≈ 0 for those terms anyway), bounding cost at
  * rows × maxDf. NewOpsBench measures the cliff: on a corpus whose every
  * term is stop-like, the uncut join is quadratic while maxDf keeps it
  * linear. Dots/norms stay exact regardless of the cut.
  */
object SparseSimilarity {

  /** Term frequencies per (id, term) from a whitespace-tokenized text. */
  def termFreqs(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("id"), explode(split(text, " ")).as("t"))
      .filter(length(col("t")) > 0)
      .groupBy(col("id"), col("t")).agg(count(lit(1)).as("tf"))

  /** Cosine-scored pairs (a < b) from a tf table, with integer dot and
    * norms carried through. `maxDf` = None → exact over all terms.
    */
  def cosinePairs(tf: DataFrame, maxDf: Option[Long]): DataFrame = {
    val pruned = maxDf match {
      case Some(cap) =>
        val df = tf.groupBy(col("t")).agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= cap)
        tf.join(df.select("t"), "t")
      case None => tf
    }
    val norms = tf.groupBy(col("id")).agg(sum(col("tf") * col("tf")).as("n2"))
    val b = pruned.select(col("id").as("db"), col("t"), col("tf").as("tfb"))
    pruned.join(b, pruned("t") === b("t") && pruned("id") < b("db"))
      .groupBy(col("id").as("da"), col("db"))
      .agg(sum(col("tf") * col("tfb")).as("dot"))
      .join(norms.select(col("id").as("da"), col("n2").as("na2")), "da")
      .join(norms.select(col("id").as("db"), col("n2").as("nb2")), "db")
      .withColumn("cos",
        round(col("dot") / sqrt((col("na2") * col("nb2")).cast("double")), 6))
  }
}
