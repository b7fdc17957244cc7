package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity (fuzzy) string join: all pairs within Levenshtein distance
  * `maxDist`, computed EXACTLY but without an all-pairs product. The
  * classic entity-resolution / curation primitive (near-identical names,
  * OCR variants, typo'd records).
  *
  * Candidate generation is positional-q-gram blocking with the standard
  * count-filtering completeness bound (Gravano et al., "Approximate
  * string joins in a database (almost) for free", VLDB 2001): one edit
  * destroys at most q overlapping q-grams, and a string of length L has
  * L−q+1 of them — so two strings within distance d MUST share a q-gram
  * whenever min(L)−q+1 > d·q. Rows shorter than (d+1)·q cannot rely on
  * the bound and are blocked on a single length-band key instead (they
  * are, by definition, cheap to compare). A length filter ||L1|−L2|| ≤ d
  * prunes candidates before the rerank; the exact levenshtein runs only
  * on the blocked, deduped candidate set.
  *
  * Scale: shuffle keys are q-grams — linear in total q-gram volume, like
  * the MinHash band join; candidates (not the corpus) flow to the
  * rerank. A corpus-wide hot q-gram (shared template prefix) degrades
  * toward the pair set of its block — the same skew profile as any
  * blocking scheme; pick `q`/pre-strip boilerplate accordingly.
  */
object FuzzyJoin {

  /** All (left id, right id, distance) pairs with
    * levenshtein(leftStr, rightStr) ≤ maxDist. Self-join safe: pass the
    * same DataFrame twice and drop the diagonal with `idL < idR` on the
    * result. Output: (id_l, id_r, dist) — join payloads back by id.
    */
  def join(
      left: DataFrame,
      leftId: String,
      leftStr: String,
      right: DataFrame,
      rightId: String,
      rightStr: String,
      maxDist: Int,
      q: Int = 3): DataFrame = {
    require(maxDist >= 0, "maxDist must be nonnegative")
    require(q > 0, "q-gram width must be positive")
    val minLen = (maxDist + 1) * q

    // Blocking keys. Long strings (len ≥ minLen) emit their q-grams —
    // the count bound guarantees any within-distance partner of length
    // ≥ minLen shares one. Strings below the BOUNDARY minLen + maxDist
    // additionally emit length-band keys (band = len div (maxDist+1),
    // own band AND successor, both sides): a within-distance pair's
    // bands differ by ≤ 1, so {b, b+1} × {b', b'+1} always intersects —
    // and any pair involving a sub-minLen string has both lengths below
    // the boundary, so the band path covers exactly the pairs the gram
    // bound can't.
    def keys(df: DataFrame, id: String, s: String) = {
      val len = length(col(s))
      val grams = when(len >= minLen,
        transform(sequence(lit(0), len - q), i => col(s).substr(i + 1, lit(q))))
        .otherwise(array())
      val band = call_function("div", len.cast("long"), lit((maxDist + 1).toLong))
      val bandKeys = when(len < minLen + maxDist,
        array(concat(lit("L"), band.cast("string")),
          concat(lit("L"), (band + 1).cast("string"))))
        .otherwise(array())
      df.select(col(id).as("_fid"), col(s).as("_fs"),
          explode(concat(grams, bandKeys)).as("_key"))
        .distinct()
    }

    val l = keys(left, leftId, leftStr)
      .withColumnRenamed("_fid", "id_l").withColumnRenamed("_fs", "_sl")
    val r = keys(right, rightId, rightStr)
      .withColumnRenamed("_fid", "id_r").withColumnRenamed("_fs", "_sr")

    // Dedup candidate IDs before the rerank so a pair sharing many
    // q-grams is scored once, and the length filter prunes first.
    val cands = l.join(r, "_key")
      .filter(abs(length(col("_sl")) - length(col("_sr"))) <= maxDist)
      .select(col("id_l"), col("_sl"), col("id_r"), col("_sr"))
      .distinct()

    cands
      .withColumn("dist", levenshtein(col("_sl"), col("_sr")))
      .filter(col("dist") <= maxDist)
      .select(col("id_l"), col("id_r"), col("dist").cast("long").as("dist"))
  }
}
