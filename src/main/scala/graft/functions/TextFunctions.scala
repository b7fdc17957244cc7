package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines
  * (SURVEY.md §2.7 L4/L5). Everything here is a pure Column expression —
  * codegen'd, shuffle-free, and deterministic, so it scales linearly with
  * the corpus and is usable inside any aggregation or dedup pipeline.
  */
object TextFunctions {

  /** Whitespace tokenization (the corpus is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count estimate: runs of letters, single digits, and
    * single punctuation marks — a cheap, deterministic proxy for an LLM
    * tokenizer's token count.
    */
  def tokenEstimate(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]|[^a-z0-9\\s]"), lit(0)))

  /** Word n-gram shingles ("a b c", n=2 → ["a b", "b c"]); empty when the
    * document has fewer than n tokens (sequence() would run backwards).
    *
    * letTokens is load-bearing: referencing `tokens(text)` directly inside
    * the inner lambda would re-run the split for EVERY shingle (Catalyst
    * does not CSE across lambda boundaries) — measured 4.5× slower on
    * shingle-heavy plans.
    */
  def wordShingles(text: Column, n: Int): Column =
    letTokens(tokens(text)) { toks =>
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
        .otherwise(array())
    }

  /** Per-distinct-value counts of a string array, as
    * array<struct<v: string, c: bigint>> in ascending value order —
    * sort + run boundaries, one O(t log t) map-side pass. The building
    * block that turns a corpus-wide (row, value) explode + shuffle
    * aggregation into an explode of ALREADY-COUNTED pairs: the
    * per-row counting happens inside the scan projection, so the
    * downstream shuffle carries one row per distinct value per row
    * instead of one per occurrence — and any per-row grouping that
    * follows needs no shuffle at all (the pairs of one row never leave
    * their partition).
    */
  def valueCounts(arr: Column): Column =
    letTokens(array_sort(arr)) { sorted =>
      when(size(sorted) > 0,
        letTokens(concat(
          filter(sequence(lit(0), size(sorted) - 1), i =>
            // CaseWhen, not ||: ANSI element_at(_, 0) would throw on
            // the i=0 probe if the disjunction evaluated eagerly
            when(i === 0, lit(true))
              .otherwise(element_at(sorted, i + 1) =!=
                element_at(sorted, i))),
          array(size(sorted)))) { bounds =>
          // bounds = run starts ++ [t]; run j spans
          // [bounds[j], bounds[j+1]) of the sorted array
          transform(sequence(lit(0), size(bounds) - 2), j =>
            struct(
              element_at(sorted, element_at(bounds, j + 1) + 1).as("v"),
              (element_at(bounds, j + 2) - element_at(bounds, j + 1))
                .cast("long").as("c")))
        })
        .otherwise(array().cast("array<struct<v:string,c:bigint>>"))
    }

  /** Character n-gram shingles over the raw string. */
  def charShingles(text: Column, n: Int): Column =
    when(length(text) >= n,
      transform(sequence(lit(0), length(text) - n),
        i => text.substr(i + 1, lit(n))))
      .otherwise(array())

  /** Winnowed k-gram fingerprints (Schleimer, Wilkerson & Aiken,
    * "Winnowing: local algorithms for document fingerprinting", SIGMOD
    * 2003): hash every character k-gram, slide a w-hash window, keep
    * each window's minimum, dedup. Guarantee: any shared substring of
    * length ≥ w + k − 1 between two documents yields at least one shared
    * fingerprint, at an expected density of 2/(w+1) — the fingerprint
    * set is ~w/2× smaller than the gram stream yet still catches every
    * long-enough clone. Hashes are md5-derived (first 15 hex chars →
    * bigint) so an external engine replays them bit-exactly. Documents
    * shorter than k fingerprint to an empty array.
    *
    * Scale note: pair generation over these fingerprints is an equi-join
    * on the fingerprint value — a corpus-hot fingerprint (shared
    * boilerplate) concentrates a block exactly like a hot q-gram; cap
    * fingerprint document-frequency the way SparseSimilarity's maxDf
    * does before joining at 100 TB.
    */
  def winnowedFingerprints(text: Column, k: Int, w: Int): Column = {
    require(k > 0 && w > 0, "k-gram and window widths must be positive")
    letTokens(transform(charShingles(text, k),
        g => conv(substring(md5(g), 1, 15), 16, 10).cast("long"))) { hs =>
      when(size(hs) >= w,
        array_distinct(transform(sequence(lit(0), size(hs) - w),
          i => array_min(slice(hs, i + 1, lit(w))))))
        .otherwise(when(size(hs) >= 1, array(array_min(hs)))
          .otherwise(array().cast("array<long>")))
    }
  }

  /** Rolling polynomial hash fingerprint of the full document:
    * fold(acc = acc*31 + ord(char) mod 1e9+7). The modulus keeps every
    * intermediate below 2^35, safe under ANSI overflow checking, and the
    * same fold is expressible in the DuckDB oracle via list_reduce.
    * Default is the native codegen expression (no per-char array
    * allocation); `fingerprintHof` keeps the higher-order-function
    * formulation for cross-checking.
    */
  def fingerprint(text: Column): Column =
    graft.plans.RollingFingerprint.fingerprint(text)

  /** HOF formulation of the same fold (identical results on ASCII). */
  def fingerprintHof(text: Column): Column =
    aggregate(
      transform(split(text, ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, c) => (acc * 31L + c) % 1000000007L)

  /** Heuristic quality score in (0,1): logistic in average word length
    * (garbage runs → very long "words" → low score; single letters → low
    * chars/token). Rounded to 6dp so it is engine-comparable.
    */
  def qualityScore(text: Column): Column =
    when(length(trim(text)) === 0, lit(0.0)).otherwise(
      round(
        lit(1.0) / (lit(1.0) +
          exp(-(length(text).cast("double") / tokenCount(text).cast("double") - lit(5.0)))),
        6))

  /** L46: interpretable LINEAR quality scorer in integer micro-units —
    * the model-based-filter plumbing a pretraining pipeline runs after
    * the rule filters (the fastText/DCLM role, with a fixed
    * hand-weighted model so the score is deterministic and the DuckDB
    * replay is EXACT): every feature quantizes through non-negative
    * integer division (stopword/punctuation/uppercase densities in
    * micro-units, capped token count, word-length deviation in
    * milli-chars), the logit is an integer dot product with fixed
    * micro-weights, and classification is `logit > 0`. Swapping in
    * trained weights is a constant change; the plumbing (single
    * projection, codegen arithmetic, no UDF, no shuffle) is the
    * operator. Divisions keep both operands non-negative so Spark's
    * truncating `div` ≡ DuckDB's flooring `//`. */
  def qualityLogitMicro(text: Column): Column = {
    val sw = typedlit(stopwords("en"))
    val lc = length(text).cast("long")
    val t = greatest(size(split(text, " ")).cast("long"), lit(1L))
    val st = size(filter(split(lower(text), " "),
      w => array_contains(sw, w))).cast("long")
    val pu = length(regexp_replace(text, "[\\p{L}\\p{N}\\s]", ""))
      .cast("long")
    val up = length(regexp_replace(text, "[^A-Z]", "")).cast("long")
    val lcSafe = greatest(lc, lit(1L))
    // floor(a/b) on longs is EXACT integer division while b*quotient
    // stays under 2^52 (a correctly-rounded double quotient can only
    // cross an integer boundary when the division is exact) — our
    // numerators cap at 1e6 * doc length, far below; DuckDB replays
    // with true integer `//`
    def idiv(a: Column, b: Column): Column =
      floor(a / b).cast("long")
    val stopU = idiv(lit(1000000L) * st, t)
    val punctU = idiv(lit(1000000L) * pu, lcSafe)
    val upperU = idiv(lit(1000000L) * up, lcSafe)
    val wlenM = idiv(lit(1000L) * lc, t)
    lit(-260000L) +
      lit(3L) * stopU -
      lit(2L) * punctU -
      lit(2L) * upperU +
      lit(900L) * least(t, lit(500L)) -
      lit(150L) * abs(wlenM - lit(5500L))
  }

  /** Uppercase ratio — another quality signal (shouting / OCR noise). */
  def uppercaseRatio(text: Column): Column =
    when(length(text) > 0,
      length(regexp_replace(text, "[^A-Z]", "")).cast("double") /
        length(text).cast("double"))
      .otherwise(lit(0.0))

  /** Punctuation ratio: chars that are not letters/digits/whitespace over
    * total chars (OCR garbage and markup boilerplate score high). Unicode
    * classes so non-ASCII letters don't count as punctuation.
    */
  def punctuationRatio(text: Column): Column =
    when(length(text) > 0,
      length(regexp_replace(text, "[\\p{L}\\p{N}\\s]", "")).cast("double") /
        length(text).cast("double"))
      .otherwise(lit(0.0))

  /** LET binding for token arrays: materializes `tokens` once per row and
    * hands it to `body` as a lambda variable. Higher-order functions are
    * not whole-stage-codegen'd, so sibling references to the same split()
    * re-evaluate it per reference (and per element when captured inside a
    * lambda — the O(tokens²) trap wordShingles hit); routing every use
    * through one lambda variable pins the tokenizer to one run per row.
    */
  private def letTokens(toks0: Column)(body: Column => Column): Column =
    element_at(transform(array(toks0), body), 1)

  /** Stopword ratio against one language's function-word list — natural
    * prose sits near the language's typical density; keyword spam and
    * non-prose sit near zero.
    */
  def stopwordRatio(text: Column, lang: String = "en"): Column = {
    val sw = stopwords(lang)
    letTokens(tokens(lower(text))) { toks =>
      when(size(toks) > 0,
        size(filter(toks, t => array_contains(typedlit(sw), t))).cast("double") /
          size(toks).cast("double"))
        .otherwise(lit(0.0))
    }
  }

  /** Tiny per-language stopword lists for the n-gram/stopword-vote
    * language identifier. Public common function words.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "por", "con", "los"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "mit", "den", "ein", "zu"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "un", "une", "du", "que"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我", "不", "这", "人"))

  /** Stopword-vote language ID: count occurrences of each language's
    * stopwords among the tokens, pick the argmax (ties broken by language
    * code, deterministic). Returns "und" when no stopword matches.
    */
  def langId(text: Column): Column =
    letTokens(tokens(lower(text))) { toks =>
      val scored = stopwords.toSeq.sortBy(_._1).map { case (lang, sw) =>
        struct(
          size(filter(toks, t => array_contains(typedlit(sw), t))).as("score"),
          lit(lang).as("lang"))
      }
      val best = greatest(scored: _*)
      when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
    }

  /** Token-level repetition ratio in [0,1): 1 − distinct/total tokens.
    * Boilerplate and template spam repeat heavily; natural prose doesn't.
    * Rounded to 6dp for engine comparability.
    */
  def repetitionRatio(text: Column): Column =
    letTokens(tokens(text)) { toks =>
      when(size(toks) > 0,
        round(lit(1.0) -
          size(array_distinct(toks)).cast("double") / size(toks).cast("double"), 6))
        .otherwise(lit(0.0))
    }

  /** Share of the single most frequent token — the other repetition
    * signal (a 50%-one-word doc is spam even if the rest is diverse).
    * One pass over the sorted token array counting runs of equal
    * neighbors — O(t log t), same rewrite as [[topNgramCharFrac]]
    * (the count-per-distinct-token form was O(distinct·total)).
    */
  def maxTokenShare(text: Column): Column =
    letTokens(array_sort(tokens(text))) { sorted =>
      val top = aggregate(
        sorted,
        struct(lit("").as("cur"), lit(0L).as("run"), lit(0L).as("c")),
        (acc, t) => {
          val run = when(t === acc.getField("cur"),
            acc.getField("run") + 1L).otherwise(lit(1L))
          struct(t.as("cur"), run.as("run"),
            greatest(run, acc.getField("c")).as("c"))
        })
      // split("", " ") yields [""], so guard on content, not token count.
      when(length(trim(text)) > 0,
        round(top.getField("c").cast("double")
          / size(sorted).cast("double"), 6))
        .otherwise(lit(0.0))
    }

  /** Character share of the single most frequent word n-gram — the
    * Gopher repetition filter family (Rae et al. 2021 §A1.1: docs whose
    * top 2-gram covers >20% of characters are template spam). The share
    * is count·length(ngram)/length(text), ties broken to the
    * lexicographically smallest n-gram, 6dp. Pure Column expression
    * (shingle + aggregate HOFs): map-side, no shuffle, O(distinct·total)
    * per row like [[maxTokenShare]].
    */
  def topNgramCharFrac(text: Column, n: Int): Column =
    letTokens(array_sort(wordShingles(text, n))) { sorted =>
      // One pass over the SORTED shingles counting runs of equal
      // neighbors — O(t log t) vs the O(distinct·total) count-per-
      // distinct-gram formulation (NewOpsBench's combined top2+dup5
      // probe: 40.3 s → 17.6 s on 100k sf0.1 docs; the residue is
      // shingle construction itself). Ascending order makes the
      // tie-break free: only a strictly longer run replaces the
      // incumbent, so the first (smallest) gram of a tied count wins.
      val best = aggregate(
        sorted,
        struct(lit("").as("cur"), lit(0L).as("run"),
          lit(0L).as("c"), lit("").as("g")),
        (acc, g) => {
          val run = when(g === acc.getField("cur"),
            acc.getField("run") + 1L).otherwise(lit(1L))
          val better = run > acc.getField("c")
          struct(g.as("cur"), run.as("run"),
            when(better, run).otherwise(acc.getField("c")).as("c"),
            when(better, g).otherwise(acc.getField("g")).as("g"))
        })
      when(size(sorted) > 0,
        round((best.getField("c") * length(best.getField("g"))).cast("double")
          / length(text), 6))
        .otherwise(lit(0.0))
    }

  /** Fraction of word n-grams that are repeats of an earlier one —
    * 1 − distinct/total, the n-gram generalization of
    * [[repetitionRatio]] (Gopher's duplicate-n-gram filters use n=5..10).
    * 0.0 for docs shorter than n tokens. Map-side, 6dp.
    */
  def dupNgramFrac(text: Column, n: Int): Column =
    letTokens(wordShingles(text, n)) { ngrams =>
      when(size(ngrams) > 0,
        round(lit(1.0) - size(array_distinct(ngrams)).cast("double")
          / size(ngrams).cast("double"), 6))
        .otherwise(lit(0.0))
    }

  /** PII scrubbing for training-data curation: masks email addresses and
    * URLs. Patterns are deliberately simple enough to mean the same thing
    * in Java regex and RE2-family engines (no lookarounds, no \\b).
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPattern = "https?://[^ ]+"

  def scrubPii(text: Column): Column =
    regexp_replace(regexp_replace(text, UrlPattern, "<URL>"),
      EmailPattern, "<EMAIL>")

  /** URL structure extraction via Spark's native parse_url (java.net.URI
    * semantics) — host/path/single-query-param, the fields a crawl
    * pipeline groups and quota-cuts on.
    */
  def urlHost(url: Column): Column = parse_url(url, lit("HOST"))

  def urlPath(url: Column): Column = parse_url(url, lit("PATH"))

  def urlParam(url: Column, key: String): Column =
    parse_url(url, lit("QUERY"), lit(key))

  /** CANONICAL URL normalization — the dedup key a web-crawl pipeline
    * groups on (the same page arrives under dozens of spellings):
    * fragment dropped; scheme and host lowercased; `www.` and the
    * scheme's default port (`:80` http / `:443` https) stripped;
    * trailing path slashes trimmed; query params with tracking
    * prefixes (`utm_`, `fbclid`, `gclid`, `ref=`) dropped and the
    * REST SORTED so param order never splits a group. Pure codegen'd
    * string/array expressions (substring_index / regexp_replace /
    * array_sort on the split params) — map-side, zero shuffles, and
    * every step has an exact DuckDB twin (split_part / list_sort), so
    * the op is oracle-checkable end to end. Paths stay case-sensitive
    * per RFC 3986. */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = substring_index(url, "#", 1)
    val schemeRaw = substring_index(noFrag, "://", 1)
    val scheme = lower(schemeRaw)
    // after the FIRST "://" (substr, not substring_index -1 — a later
    // "://" inside the query must not re-anchor)
    val rest0 = noFrag.substr(length(schemeRaw) + 4, lit(1000000))
    // split at the FIRST '?': everything after it is the query —
    // including '/' (redirect/path param values are ubiquitous) and
    // further '?' characters, which must never re-anchor the host or
    // path split
    val hostpath = substring_index(rest0, "?", 1)
    val query = when(rest0.contains("?"),
      rest0.substr(length(hostpath) + 2, lit(1000000))).otherwise(lit(""))
    val hostport = lower(substring_index(hostpath, "/", 1))
    // IPv6 bracket literals ([::1], [2001:db8::1]:8080): the host is
    // everything through "]" — splitting on the FIRST ":" would
    // truncate inside the address. Lowercasing is still correct
    // canonicalization for hex digits. A userinfo prefix (user@host)
    // is deliberately passed through as part of the authority:
    // distinct credentials stay distinct dedup keys.
    val isBracket = hostport.startsWith("[")
    val host0 = when(isBracket,
      concat(substring_index(hostport, "]", 1), lit("]")))
      .otherwise(substring_index(hostport, ":", 1))
    val port = when(isBracket,
      when(hostport.contains("]:"), substring_index(hostport, "]:", -1))
        .otherwise(lit("")))
      .otherwise(when(hostport.contains(":"),
        substring_index(hostport, ":", -1)).otherwise(lit("")))
    val keepPort = !(port === "" ||
      (scheme === "http" && port === "80") ||
      (scheme === "https" && port === "443"))
    val host = regexp_replace(
      when(keepPort, concat(host0, lit(":"), port)).otherwise(host0),
      "^www\\.", "")
    val path = regexp_replace(
      hostpath.substr(length(hostport) + 1, lit(1000000)), "/+$", "")
    val params = array_sort(filter(split(query, "&"), p =>
      length(p) > 0 && !p.startsWith("utm_") && !p.startsWith("fbclid") &&
        !p.startsWith("gclid") && !p.startsWith("ref=")))
    val q2 = array_join(params, "&")
    // non-URL input (no "://") passes through lowercased-and-defragged
    // rather than being mangled into a fake scheme
    when(!url.contains("://"), lower(noFrag))
      .otherwise(concat(scheme, lit("://"), host, path,
        when(q2 === "", lit("")).otherwise(concat(lit("?"), q2))))
  }

  /** HTML → plain text: drop tags, THEN unescape entities (so literal
    * `&lt;tag&gt;` text survives instead of being eaten as markup —
    * entities are content, not structure), then collapse whitespace.
    * `&amp;` is unescaped LAST, the standard order that keeps
    * `&amp;lt;` meaning the literal text "&lt;". Pure codegen'd string
    * expressions — the web-crawl normalization pass at scan speed.
    */
  def stripHtml(html: Column): Column = {
    val noTags = regexp_replace(html, "<[^>]*>", " ")
    val unescaped = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (ent, ch)) => replace(c, lit(ent), lit(ch)) }
    trim(regexp_replace(unescaped, "\\s+", " "))
  }

  /** C4-style LINE filter: keep only lines with at least `minWords`
    * whitespace words, none of the `banned` substrings
    * (case-insensitive — the "lorem ipsum"/"javascript" rule), and —
    * when `requireTerminalPunct` — a terminal-punctuation ending (the
    * C4 sentence heuristic). Pure Column HOFs over the split lines:
    * map-side, zero shuffles, scan-speed at any corpus size. Dropped
    * lines vanish; an all-dropped document becomes the empty string
    * (pair with a doc-level length gate downstream). */
  def filterLines(text: Column, minWords: Int,
      banned: Seq[String] = Nil,
      requireTerminalPunct: Boolean = false): Column = {
    val kept = filter(split(text, "\n"), l => {
      val wordsOk = size(split(trim(l), " +")) >= minWords &&
        trim(l) =!= ""
      val bannedOk = banned.foldLeft(lit(true))((acc, b) =>
        acc && !lower(l).contains(lit(b.toLowerCase)))
      val punctOk =
        if (requireTerminalPunct) trim(l).rlike("[.!?\"']$") else lit(true)
      wordsOk && bannedOk && punctOk
    })
    array_join(kept, "\n")
  }

  /** Within-document duplicate-LINE removal, FIRST occurrence kept and
    * line order preserved (the boilerplate-paragraph rule: repeated
    * nav/footer lines collapse to their first appearance). Keep-first
    * via the index-aware filter HOF — `array_position` returns a
    * line's FIRST 1-based index, so a line survives iff it sits at its
    * own first position. O(lines²) per document (bounded by document
    * size), map-side, zero shuffles. */
  def dedupLines(text: Column): Column = {
    val lines = split(text, "\n")
    array_join(
      filter(lines, (l, i) => array_position(lines, l) === i + 1),
      "\n")
  }
}
