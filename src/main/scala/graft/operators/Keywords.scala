package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus keyword extraction: per-document top-k TF-IDF terms.
  *
  * Shuffle budget (the minimum the semantics admit):
  *   1. (doc, term) partial-aggregated term frequencies — map-side
  *      combine collapses each document's repeated terms before shuffle;
  *   2. per-term document frequency — aggregation of the (already
  *      reduced) tf table on term;
  *   3. tf ⋈ df on term — fact-fact sort-merge at corpus scale (AQE
  *      flips it to broadcast while the vocabulary is small);
  *   4. per-doc top-k via rank window on doc_id.
  * The corpus-size scalar joins in as a 1-row broadcast, never a shuffle.
  * All state is O(vocabulary + docs·k); nothing driver-side.
  */
object Keywords {

  /** Top-k TF-IDF terms per document: raw term count × ln(N/df), rounded
    * to 6 decimals so both engines' libm ulp differences can't leak into
    * the gate hash; ties broken by term for determinism.
    */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val tokens = docs.select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
    val tf = tokens.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term").asc)
    tf.join(dfreq, "term")
      .join(broadcast(nDocs))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("term"), col("tfidf"), col("rnk"))
  }

  /** Corpus-wide term frequencies (Zipf head): one explode + one
    * partial-aggregated shuffle on term; top-k is TakeOrderedAndProject.
    */
  def wordFrequencies(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("term")).agg(count(lit(1)).as("c"))

  /** Flat postings table (term, doc_id, tf) — the 100 TB shape of an
    * inverted index: written sorted/bucketed by term, lookups are
    * partition-pruned scans and term joins co-locate without a shuffle.
    * One explode + one partial-aggregated shuffle on (term, doc_id).
    */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))

  /** BM25 top-k retrieval (Robertson/Spärck Jones; Lucene's
    * +1-inside-the-log idf variant so scores stay positive) for a fixed
    * query-term set.
    *
    * Scale shape: the token filter runs INSIDE the scan projection, so
    * the explode + (doc, term) shuffle carries only query-term
    * occurrences — at 100 TB the shuffle is proportional to matches,
    * not corpus size. Per-term df (≤ |query| rows) and the corpus
    * stats (1 row) broadcast; the final top-k is TakeOrderedAndProject
    * (O(k) to the driver). Per-(doc,term) contributions are rounded to
    * 6dp and summed as DECIMAL(18,6) — exact and order-independent
    * (the l4_quality float discipline), so an engine's partial-agg
    * order can't drift the score.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val withDl = docs.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("toks"))
      .withColumn("dl", size(col("toks")))
    val stats = withDl.agg(count(lit(1)).as("n"),
      avg(col("dl").cast("double")).as("avgdl"))
    val tf = withDl
      .select(col("doc_id"), col("dl"),
        explode(filter(col("toks"),
          t => t.isInCollection(queryTerms.distinct))).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfq = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))
    tf.join(broadcast(dfq), "term")
      .join(broadcast(stats))
      .withColumn("idf",
        log((col("n").cast("double") - col("df") + 0.5) / (col("df") + 0.5)
          + 1.0))
      // literal-for-literal the same arithmetic as the oracle SQL: both
      // engines parse/fold the identical double expressions
      .withColumn("contrib", round(
        col("idf") * col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) *
            (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))), 6))
      .groupBy(col("doc_id"))
      .agg(sum(col("contrib").cast("decimal(18,6)")).cast("double")
        .as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Batch BM25: score EVERY query of a (query_id, term) table in one
    * pass — the retrieval-serving shape, where queries arrive in
    * batches, not one at a time. Same scoring math and float discipline
    * as [[bm25TopK]] (shared df over the union of query terms), but the
    * corpus is exploded ONCE for all queries: tokens semi-filter
    * against the broadcast term union, weights fan out to queries by a
    * broadcast term join, and each query's top-k is the mergeable
    * TopKByScore heap — O(n log k) map-side + O(k)-per-query shuffle,
    * never a per-query corpus sort or rank window.
    * Output: (query_id, doc_id, score, rnk).
    */
  def bm25PerQuery(docs: DataFrame, queries: DataFrame,
      idCol: String, textCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = queries.select(col("term")).distinct()
    val withDl = docs.select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("toks"))
      .withColumn("dl", size(col("toks")))
    val stats = withDl.agg(count(lit(1)).as("n"),
      avg(col("dl").cast("double")).as("avgdl"))
    val tf = withDl
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .join(broadcast(terms), "term")
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfq = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))
    val weights = tf.join(broadcast(dfq), "term")
      .join(broadcast(stats))
      .withColumn("idf",
        log((col("n").cast("double") - col("df") + 0.5) / (col("df") + 0.5)
          + 1.0))
      .withColumn("w", round(
        col("idf") * col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) *
            (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))), 6))
    weights
      // distinct: a term listed twice under one query_id must not fan
      // out twice (the score sum would silently double that term's
      // weight) — dedup here instead of documenting it away
      .join(broadcast(queries.select(col("query_id"), col("term")).distinct()),
        "term")
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("w").cast("decimal(18,6)")).cast("double").as("score"))
      .groupBy(col("query_id"))
      .agg(graft.plans.TopKByScore
        .top_k_by_score(col("score"), col("doc_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "hit")))
      .select(col("query_id"), col("hit.id").as("doc_id"),
        round(col("hit.score"), 6).as("score"),
        (col("pos") + 1).cast("long").as("rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Per-document mean BIGRAM log-probability — the sequential-
    * coherence quality signal the unigram LM (l29's CCNet-style score)
    * cannot see: shuffled word salad keeps its unigram distribution
    * but its bigrams collapse to near-unseen. Add-one smoothing over
    * the unigram vocabulary: ln p(t₂|t₁) = ln(c(t₁t₂)+1) −
    * ln(c(t₁)+V). Corpus-as-model here; a reference corpus's bigram
    * table joins the same way.
    *
    * Scale shape: ONE corpus explode. The bigram model is a partial-agg
    * shuffle of the already-reduced per-doc counts, and the unigram
    * model is DERIVED from the same shingle scan instead of a second
    * corpus pass: every token is the prefix of exactly one bigram
    * unless it ends its document, so unigram counts = bigram-prefix
    * weights + one per document's last token (a projection, no
    * explode). Both models are vocabulary-sized partial-agg results,
    * NOT driver state; the scoring joins carry no broadcast hints —
    * AQE broadcasts while the model fits and degrades to a keyed
    * sort-merge at web scale (a forced broadcast would OOM instead).
    * V is a 1-row broadcast. Per-(doc, bigram) contributions are 6dp +
    * DECIMAL-summed, so scores are independent of partial-agg order.
    */
  def bigramLogProb(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val db = docs.select(col(idCol).as("doc_id"),
        explode(TextFunctions.wordShingles(col(textCol), 2)).as("bg"))
      .groupBy(col("doc_id"), col("bg"))
      .agg(count(lit(1)).cast("double").as("cd"))
    val bi = db.groupBy(col("bg")).agg(sum(col("cd")).as("cb"))
    // unigram counts without re-exploding the corpus: prefix weights
    // from db + each document's last token (single-token docs have no
    // bigrams and still land here; empty tokens are filtered exactly
    // like wordFrequencies does)
    val uni = db.select(substring_index(col("bg"), " ", 1).as("term"),
        col("cd").as("w"))
      .unionAll(docs
        .select(element_at(TextFunctions.tokens(col(textCol)), -1).as("term"))
        .withColumn("w", lit(1.0)))
      .filter(length(col("term")) > 0)
      .groupBy(col("term")).agg(sum(col("w")).as("c"))
    val v = uni.agg(count(lit(1)).as("v"))
    db.join(bi, "bg")
      .withColumn("prefix", substring_index(col("bg"), " ", 1))
      .join(uni.withColumnRenamed("term", "prefix"), "prefix")
      .join(broadcast(v))
      .withColumn("contrib", round(col("cd") *
        (log(col("cb").cast("double") + 1.0)
          - log(col("c").cast("double") + col("v").cast("double"))), 6))
      .groupBy(col("doc_id"))
      // Σcd = the doc's bigram positions (every bigram is in the model)
      .agg(round(sum(col("contrib").cast("decimal(18,6)")).cast("double")
        / sum(col("cd")), 6).as("bilp"))
      .orderBy(col("doc_id"))
  }

  /** Positional postings: (term, doc_id, sorted token positions) — the
    * search-engine index shape that makes PHRASE queries a postings
    * intersection instead of a text rescan. Same 100 TB layout story as
    * [[postings]]: term-bucketed on disk, per-term lookups are
    * partition-pruned reads.
    */
  def positionalPostings(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        posexplode(TextFunctions.tokens(col(textCol))).as(Seq("pos", "term")))
      .filter(length(col("term")) > 0)
      .groupBy(col("term"), col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("positions"))

  /** Exact phrase match: documents containing `phrase` as consecutive
    * tokens. The first term's positions are the candidates; each later
    * term's postings join on doc_id and keep candidates x with x+i in
    * that term's position set (an array_contains HOF over the joined
    * postings — no re-tokenization, no regex rescan of text). Each join
    * is doc-keyed and only over docs containing BOTH terms, so the work
    * is bounded by the rarest term's postings, the classic
    * intersect-by-rarity property. Output: (doc_id, n_occurrences).
    */
  def phraseMatches(docs: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val posts = positionalPostings(docs, idCol, textCol)
    def of(t: String, i: Int) = posts.filter(col("term") === t)
      .select(col("doc_id"), col("positions").as(s"p$i"))
    val anchored = phrase.zipWithIndex.tail
      .foldLeft(of(phrase.head, 0).withColumnRenamed("p0", "cand")) {
        case (acc, (t, i)) =>
          acc.join(of(t, i), "doc_id")
            .withColumn("cand",
              filter(col("cand"), x => array_contains(col(s"p$i"), x + i)))
            .drop(s"p$i")
      }
    anchored.filter(size(col("cand")) > 0)
      .select(col("doc_id"), size(col("cand")).cast("long").as("n_occ"))
  }

  /** Grouped inverted index: per-term document frequency, total term
    * frequency, and the postings list sorted by doc_id. The array form
    * suits moderate-df vocabularies (a term's postings must fit one row);
    * web-scale hot terms should stay in the flat [[postings]] shape —
    * that boundary is exactly the classic postings-list-vs-block split.
    */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    postings(docs, idCol, textCol)
      .groupBy(col("term"))
      .agg(
        count(lit(1)).as("df"),
        sum(col("tf")).as("tf_total"),
        array_sort(collect_list(struct(col("doc_id"), col("tf"))))
          .as("postings"))
}
