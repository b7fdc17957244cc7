package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.TxnTable
import graft.functions.TextFunctions

/** The TRANSACTIONAL text index — [[Keywords.buildIndex]]'s layout
  * committed through [[TxnTable]], for the mutable-corpus regime the
  * plain-parquet index explicitly excludes:
  *
  *  - **snapshot isolation**: a reader serving a query sees one
  *    committed version of postings AND corpus stats together — an
  *    appender/upserter racing it can never tear the pair apart
  *    (`asOf` pins both reads to a single resolved version);
  *  - **re-ingest safety**: upserting a doc id that already exists
  *    REPLACES its postings and corrects the corpus stats in the same
  *    atomic commit, where the plain index's append would double-count
  *    df/tf (its documented, unchecked hazard);
  *  - **time travel / restore / vacuum** come for free from the log.
  *
  * One TxnTable holds three row kinds, discriminated by `kind` and
  * separated physically by sentinel `bucket` values so every serving
  * read stays file-pruned ([[TxnTable.readPrunedIn]] on the footer
  * min/max of `bucket`):
  *
  *  - `'p'` postings: (term, doc_id, dl, positions, tf),
  *    bucket = pmod(xxhash64(term), nBuckets) — the serving rows;
  *  - `'d'` doc registry: (doc_id, dl), bucket = −2 — what upsert
  *    needs to subtract a replaced doc's contribution from the stats
  *    fold even when the doc produced no postings rows (empty text);
  *  - `'s'` stats tranches: (n, sum_dl, n_buckets), bucket = −1 —
  *    ADDITIVE rows (corrections may carry negative deltas); readers
  *    fold Σn, Σsum_dl, so avgdl = Σdl/Σn is bit-identical to the
  *    rescan path's (count, avg) doubles on the corpus's current
  *    logical state.
  *
  * The atomicity trick: [[TxnTable.merge]] keyed on `doc_id` deletes
  * every old row of the re-ingested docs (their 'p' and 'd' rows) and
  * inserts the new postings + registry + one stats-delta row — whose
  * doc_id is NULL, so it matches nothing and rides the same commit as
  * a pure insert. One commit, no torn state.
  *
  * Scale shape: build/upsert cost one corpus-tranche explode + one
  * range shuffle (clustered write); a query reads only the files whose
  * bucket range covers its terms (hard-asserted in the l37 gate), and
  * scoring reuses [[Keywords]]' exact tails. The bucket count scales
  * with the corpus; the read stays proportional to the query terms'
  * postings.
  */
object TxnIndex {

  private def clusterKeys = Seq(col("bucket"), col("term"), col("doc_id"))

  /** (postings ∪ registry ∪ stats-delta) rows for one corpus tranche.
    * `statsDelta` lets upsert turn the tranche's raw (n, Σdl) into a
    * correction against the replaced docs' contribution. */
  private def trancheRows(docs: DataFrame, idCol: String, textCol: String,
      nBuckets: Int, statsDelta: Option[(Long, Long)]): DataFrame = {
    val nulls = Seq(lit(null).cast("bigint").as("n"),
      lit(null).cast("bigint").as("sum_dl"),
      lit(null).cast("int").as("n_buckets"))
    val withDl = docs.select(col(idCol).cast("long").as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("toks"))
      .withColumn("dl", size(col("toks")))
    val posts = withDl
      .select(col("doc_id"), col("dl"),
        posexplode(col("toks")).as(Seq("pos", "term")))
      .filter(length(col("term")) > 0)
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(sort_array(collect_list(col("pos"))).as("positions"))
      .select((lit("p").as("kind") +: col("term") +: col("doc_id") +:
        col("dl") +: col("positions") +:
        size(col("positions")).cast("double").as("tf") +:
        pmod(xxhash64(col("term")), lit(nBuckets)).cast("int").as("bucket") +:
        nulls): _*)
    val registry = withDl
      .select((lit("d").as("kind") +: lit(null).cast("string").as("term") +:
        col("doc_id") +: col("dl") +:
        lit(null).cast("array<int>").as("positions") +:
        lit(null).cast("double").as("tf") +: lit(-2).as("bucket") +:
        nulls): _*)
    val raw = withDl.agg(count(lit(1)).as("cnt"),
      coalesce(sum(col("dl")), lit(0L)).cast("long").as("sdl"))
    val stats = (statsDelta match {
      case Some((repN, repSdl)) =>
        raw.select((col("cnt") - lit(repN)).as("n"),
          (col("sdl") - lit(repSdl)).as("sum_dl"))
      case None => raw.select(col("cnt").as("n"), col("sdl").as("sum_dl"))
    }).select(lit("s").as("kind"), lit(null).cast("string").as("term"),
      lit(null).cast("bigint").as("doc_id"), lit(null).cast("int").as("dl"),
      lit(null).cast("array<int>").as("positions"),
      lit(null).cast("double").as("tf"), lit(-1).as("bucket"),
      col("n"), col("sum_dl"), lit(nBuckets).as("n_buckets"))
    posts.unionAll(registry).unionAll(stats)
  }

  /** Create the index table at `path` from `docs` — version 0 is the
    * fully-clustered layout, prunable from the first read. */
  def build(docs: DataFrame, idCol: String, textCol: String,
      path: String, nBuckets: Int = 64): Long =
    TxnTable.createClustered(docs.sparkSession, path,
      trancheRows(docs, idCol, textCol, nBuckets, None),
      clusterKeys, nBuckets + 2)

  /** Upsert a tranche: NEW doc ids append; EXISTING doc ids are
    * re-ingested — old postings and registry rows replaced, stats
    * corrected by the replaced docs' (count, Σdl) — in ONE atomic merge
    * commit. The replaced-stats fold is computed against the snapshot
    * version the merge then CAS-checks (`expectedBase`), so a racing
    * writer aborts this upsert loudly instead of letting it commit a
    * stale correction; retry by re-running (the tranche frame is
    * deterministic).
    */
  def upsert(docs: DataFrame, idCol: String, textCol: String,
      path: String): Long = {
    val spark = docs.sparkSession
    val base = TxnTable.currentVersion(path)
    val nb = nBucketsOf(spark, path, base)
    val incoming = docs.select(col(idCol).cast("long").as("doc_id")).distinct()
    val replaced = TxnTable.readPrunedIn(spark, path, "bucket", Seq(-2L), base)
      .filter(col("kind") === "d")
      .join(incoming, Seq("doc_id"), "left_semi")
      .agg(count(lit(1)).as("c"), coalesce(sum(col("dl")), lit(0L)).as("s"))
      .head()
    val rows = trancheRows(docs, idCol, textCol, nb,
      Some((replaced.getLong(0), replaced.getLong(1))))
    TxnTable.merge(spark, path, rows, Seq("doc_id"),
      partitions = math.max(1, nb / 8), clusterBy = clusterKeys,
      expectedBase = base)
  }

  private def nBucketsOf(spark: SparkSession, path: String,
      asOf: Long): Int =
    TxnTable.readPrunedIn(spark, path, "bucket", Seq(-1L), asOf)
      .filter(col("kind") === "s")
      .select(col("n_buckets")).head().getInt(0)

  /** The folded (n, avgdl) stats at `asOf` — same doubles as a rescan
    * of the corpus's current logical state (integer sums, one final
    * division). */
  private def statsAt(spark: SparkSession, path: String,
      asOf: Long): DataFrame =
    TxnTable.readPrunedIn(spark, path, "bucket", Seq(-1L), asOf)
      .filter(col("kind") === "s")
      .agg(sum(col("n")).as("n"), sum(col("sum_dl")).as("sdl"))
      .select(col("n"),
        (col("sdl").cast("double") / col("n").cast("double")).as("avgdl"))

  /** Postings of exactly `terms` at `asOf`: the footer index prunes to
    * the terms' bucket files, the term filter pushes into the scan. */
  def readPostings(spark: SparkSession, path: String, terms: Seq[String],
      asOf: Long = -1L): DataFrame = {
    val v = resolve(path, asOf)
    val nb = nBucketsOf(spark, path, v)
    val buckets = Keywords.termBuckets(spark, terms.distinct, nb)
    TxnTable.readPrunedIn(spark, path, "bucket", buckets.map(_.toLong), v)
      .filter(col("kind") === "p")
      .filter(col("term").isInCollection(terms.distinct))
  }

  /** Pin every read of one serving call to a single committed version —
    * stats and postings can never come from different snapshots. */
  private def resolve(path: String, asOf: Long): Long =
    if (asOf >= 0) asOf else TxnTable.currentVersion(path)

  /** BM25 top-k served from the committed index at `asOf` (default:
    * latest). Bit-identical to [[Keywords.bm25TopK]] over the corpus's
    * current logical state — shared scoring tail, same stats doubles. */
  def bm25TopK(spark: SparkSession, path: String, queryTerms: Seq[String],
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      asOf: Long = -1L): DataFrame = {
    val v = resolve(path, asOf)
    val tf = readPostings(spark, path, queryTerms, v)
      .select(col("doc_id"), col("dl"), col("term"), col("tf"))
    Keywords.bm25ScoreTopK(tf, statsAt(spark, path, v), k, k1, b)
  }

  /** Batch BM25 over a (query_id, term) table, served from the
    * committed index — one pruned read for the union of query terms. */
  def bm25PerQuery(spark: SparkSession, path: String, queries: DataFrame,
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      asOf: Long = -1L): DataFrame = {
    val v = resolve(path, asOf)
    val nb = nBucketsOf(spark, path, v)
    // the bucket set is folded DISTRIBUTIVELY from the query table
    // (≤ nBuckets ints to the driver, never the term list itself)
    val buckets = queries
      .select(pmod(xxhash64(col("term")), lit(nb)).cast("long").as("b"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val tf = TxnTable.readPrunedIn(spark, path, "bucket", buckets, v)
      .filter(col("kind") === "p")
      .join(queries.select(col("term")).distinct(), Seq("term"), "left_semi")
      .select(col("doc_id"), col("dl"), col("term"), col("tf"))
    Keywords.bm25PerQueryFrom(tf, statsAt(spark, path, v), queries, k, k1, b)
  }

  /** Phrase search served from the committed index: postings
    * intersection over only the phrase terms' bucket files. */
  def phraseMatches(spark: SparkSession, path: String, phrase: Seq[String],
      asOf: Long = -1L): DataFrame =
    Keywords.phraseFromPostings(
      readPostings(spark, path, phrase, resolve(path, asOf))
        .select(col("term"), col("doc_id"), col("positions")),
      phrase)
}
