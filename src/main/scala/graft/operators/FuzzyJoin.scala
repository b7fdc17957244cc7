package graft.operators

import org.apache.spark.sql.DataFrame
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
  * rerank. A corpus-wide hot q-gram (shared template prefix / stop
  * shingle) would otherwise degrade toward the pair set of its block, so
  * `hotGramDf` caps blocking-key frequency: grams seen in more than that
  * many rows are dropped as keys, and every row that CONTAINED a dropped
  * gram is rerouted through the length-band path instead. Exactness is
  * preserved: a within-distance pair either shares a surviving (cold)
  * gram — gram path — or shares only hot grams, in which case BOTH rows
  * carry a hot gram, both emit their {band, band+1} keys, and bands of
  * within-distance pairs differ by ≤ 1 — band path. Hot blocks thus cost
  * the length-band block size (corpus length distribution), never the
  * quadratic hot-gram block.
  */
object FuzzyJoin {

  /** All (left id, right id, distance) pairs with
    * levenshtein(leftStr, rightStr) ≤ maxDist. Self-join safe: pass the
    * same DataFrame twice and drop the diagonal with `idL < idR` on the
    * result. Output: (id_l, id_r, dist) — join payloads back by id.
    * `hotGramDf` = 0 disables the hot-gram guard (no df pre-pass); at
    * scale set it to a small multiple of the expected block size.
    */
  def join(
      left: DataFrame,
      leftId: String,
      leftStr: String,
      right: DataFrame,
      rightId: String,
      rightStr: String,
      maxDist: Int,
      q: Int = 3,
      hotGramDf: Long = 0L): DataFrame = {
    candidates(left, leftId, leftStr, right, rightId, rightStr,
        maxDist, q, hotGramDf)
      .withColumn("dist", levenshtein(col("_sl"), col("_sr")))
      .filter(col("dist") <= maxDist)
      .select(col("id_l"), col("id_r"), col("dist").cast("long").as("dist"))
  }

  /** The deduped candidate pair set the rerank scores. */
  private[operators] def candidates(
      left: DataFrame,
      leftId: String,
      leftStr: String,
      right: DataFrame,
      rightId: String,
      rightStr: String,
      maxDist: Int,
      q: Int = 3,
      hotGramDf: Long = 0L): DataFrame = {
    val (l, r) = keyedSides(left, leftId, leftStr, right, rightId, rightStr,
      maxDist, q, hotGramDf)
    val lk = l.select(col("_fid").as("id_l"), col("_fs").as("_sl"), col("_key"))
    val rk = r.select(col("_fid").as("id_r"), col("_fs").as("_sr"), col("_key"))

    // Dedup candidate IDs before the rerank so a pair sharing many
    // q-grams is scored once, and the length filter prunes first.
    lk.join(rk, "_key")
      .filter(abs(length(col("_sl")) - length(col("_sr"))) <= maxDist)
      .select(col("id_l"), col("_sl"), col("id_r"), col("_sr"))
      .distinct()
  }

  /** The blocking-key frames ((_fid, _fs, _key) per side) AFTER the
    * hot-gram guard — package-visible so the spec can assert the guard
    * bounds the block-join volume a planted hot gram would create.
    */
  private[operators] def keyedSides(
      left: DataFrame,
      leftId: String,
      leftStr: String,
      right: DataFrame,
      rightId: String,
      rightStr: String,
      maxDist: Int,
      q: Int,
      hotGramDf: Long): (DataFrame, DataFrame) = {
    require(maxDist >= 0, "maxDist must be nonnegative")
    require(q > 0, "q-gram width must be positive")
    require(hotGramDf >= 0, "hotGramDf must be nonnegative (0 = disabled)")
    val minLen = (maxDist + 1) * q

    // Blocking keys, one row per (id, key). Long strings (len ≥ minLen)
    // emit their q-grams (marked _g = true) — the count bound guarantees
    // any within-distance partner of length ≥ minLen shares one. Strings
    // below the BOUNDARY minLen + maxDist additionally emit length-band
    // keys (band = len div (maxDist+1), own band AND successor, both
    // sides): a within-distance pair's bands differ by ≤ 1, so
    // {b, b+1} × {b', b'+1} always intersects — and any pair involving a
    // sub-minLen string has both lengths below the boundary, so the band
    // path covers exactly the pairs the gram bound can't.
    def keys(df: DataFrame, id: String, s: String) = {
      val len = length(col(s))
      val grams = when(len >= minLen,
        transform(sequence(lit(0), len - q), i =>
          struct(col(s).substr(i + 1, lit(q)).as("k"), lit(true).as("g"))))
        .otherwise(array())
      val band = call_function("div", len.cast("long"), lit((maxDist + 1).toLong))
      val bandKeys = when(len < minLen + maxDist,
        array(struct(concat(lit("L"), band.cast("string")).as("k"), lit(false).as("g")),
          struct(concat(lit("L"), (band + 1).cast("string")).as("k"), lit(false).as("g"))))
        .otherwise(array())
      df.select(col(id).as("_fid"), col(s).as("_fs"),
          explode(concat(grams, bandKeys)).as("_kg"))
        .select(col("_fid"), col("_fs"),
          col("_kg.k").as("_key"), col("_kg.g").as("_g"))
        .distinct()
    }

    val l0 = keys(left, leftId, leftStr)
    val r0 = keys(right, rightId, rightStr)

    if (hotGramDf <= 0L)
      (l0.drop("_g"), r0.drop("_g"))
    else {
      // Hot gram = blocking key appearing in more than hotGramDf rows
      // across both sides. High-frequency ⇒ few distinct values, so the
      // hot list is broadcast-sized by construction.
      val hot = l0.unionByName(r0).filter(col("_g"))
        .groupBy(col("_key")).agg(count(lit(1)).as("_n"))
        .filter(col("_n") > hotGramDf)
        .select(col("_key"), lit(true).as("_hot"))
      def reroute(df: DataFrame): DataFrame = {
        val flagged = df.join(broadcast(hot), Seq("_key"), "left_outer")
        val kept = flagged.filter(col("_hot").isNull)
          .select(col("_fid"), col("_fs"), col("_key"))
        // Rows that LOST a hot gram re-enter via their length bands so
        // hot-only-shared pairs stay covered (both members contain the
        // shared hot gram, so both are rerouted).
        val band = call_function("div",
          length(col("_fs")).cast("long"), lit((maxDist + 1).toLong))
        val rerouted = flagged.filter(col("_hot").isNotNull)
          .select(col("_fid"), col("_fs")).distinct()
          .select(col("_fid"), col("_fs"),
            explode(array(concat(lit("L"), band.cast("string")),
              concat(lit("L"), (band + 1).cast("string")))).as("_key"))
        kept.unionByName(rerouted).distinct()
      }
      (reroute(l0), reroute(r0))
    }
  }
}
