package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class TextFunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String): Any =
    Seq(text).toDF("t").select(c).head().get(0)

  test("langId identifies handcrafted samples; und for no stopwords") {
    assert(one(TextFunctions.langId(col("t")),
      "the cat sat on the mat and it is happy") == "en")
    assert(one(TextFunctions.langId(col("t")),
      "el gato y la casa de los amigos") == "es")
    assert(one(TextFunctions.langId(col("t")),
      "der hund und die katze ist von dem haus") == "de")
    assert(one(TextFunctions.langId(col("t")),
      "le chat et les amis du jardin est une merveille") == "fr")
    assert(one(TextFunctions.langId(col("t")),
      "qwerty zxcvb asdfgh") == "und")
  }

  test("fingerprint is deterministic and sensitive to single-char edits") {
    val a = one(TextFunctions.fingerprint(col("t")), "hello world")
    val b = one(TextFunctions.fingerprint(col("t")), "hello world")
    val c = one(TextFunctions.fingerprint(col("t")), "hello worle")
    assert(a == b)
    assert(a != c)
  }

  test("native fingerprint equals the HOF formulation on corpus text") {
    val docs = graft.core.Lake.table(spark, sf0001, "documents")
    val diff = docs.select(
        TextFunctions.fingerprint(col("text")).as("n"),
        TextFunctions.fingerprintHof(col("text")).as("h"))
      .filter(col("n") =!= col("h")).count()
    assert(diff == 0)
  }

  test("qualityScore: empty text → 0.0; longer words → higher score") {
    assert(one(TextFunctions.qualityScore(col("t")), "") == 0.0)
    assert(one(TextFunctions.qualityScore(col("t")), "   ") == 0.0)
    val short = one(TextFunctions.qualityScore(col("t")), "a b c d").asInstanceOf[Double]
    val long = one(TextFunctions.qualityScore(col("t")), "wonderful excellent paragraph").asInstanceOf[Double]
    assert(long > short)
  }

  test("wordShingles: shorter than n → empty; correct n-grams") {
    assert(one(TextFunctions.wordShingles(col("t"), 3), "a b")
      .asInstanceOf[scala.collection.Seq[String]].isEmpty)
    assert(one(TextFunctions.wordShingles(col("t"), 2), "a b c")
      .asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("a b", "b c"))
  }

  test("charShingles produce overlapping windows") {
    assert(one(TextFunctions.charShingles(col("t"), 3), "abcd")
      .asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("abc", "bcd"))
  }

  test("tokenEstimate counts letter runs, digits, punct separately") {
    assert(one(TextFunctions.tokenEstimate(col("t")), "hello w0rld, x!") == 7)
  }

  test("uppercaseRatio") {
    assert(one(TextFunctions.uppercaseRatio(col("t")), "AbCd") == 0.5)
  }

  test("punctuationRatio: unicode letters are NOT punctuation; empty → 0") {
    assert(one(TextFunctions.punctuationRatio(col("t")), "ab,.!?cd") == 0.5)
    assert(one(TextFunctions.punctuationRatio(col("t")), "héllo wörld") == 0.0)
    assert(one(TextFunctions.punctuationRatio(col("t")), "a1 b2") == 0.0)
    assert(one(TextFunctions.punctuationRatio(col("t")), "") == 0.0)
  }

  test("stopwordRatio: counts function words per language list") {
    assert(one(TextFunctions.stopwordRatio(col("t")), "the cat and the dog") == 0.6)
    assert(one(TextFunctions.stopwordRatio(col("t")), "cat dog") == 0.0)
    assert(one(TextFunctions.stopwordRatio(col("t"), "es"), "el perro y la gata") == 0.6)
    assert(one(TextFunctions.stopwordRatio(col("t")), "") == 0.0)
  }

  test("repetitionRatio: 1 - distinct/total; empty → 0") {
    assert(one(TextFunctions.repetitionRatio(col("t")), "a a a b") == 0.5)
    assert(one(TextFunctions.repetitionRatio(col("t")), "a b c d") == 0.0)
    assert(one(TextFunctions.repetitionRatio(col("t")), "") == 0.0)
  }

  test("maxTokenShare: most frequent token's share of all tokens") {
    assert(one(TextFunctions.maxTokenShare(col("t")), "a a a b") == 0.75)
    assert(one(TextFunctions.maxTokenShare(col("t")), "a b c d") == 0.25)
    assert(one(TextFunctions.maxTokenShare(col("t")), "") == 0.0)
  }

  test("topNgramCharFrac: top n-gram's char share, smallest-gram ties") {
    // "a b" occurs twice (6 of 9 chars incl. the inner space)
    assert(one(TextFunctions.topNgramCharFrac(col("t"), 2), "a b a b c")
      == 0.666667)
    // tie at count 2 between "b c" and "a d" → lexicographically smaller
    assert(one(TextFunctions.topNgramCharFrac(col("t"), 2),
      "b c b c a d a d") == 0.4) // "a d": 2·3/15
    assert(one(TextFunctions.topNgramCharFrac(col("t"), 3),
      "x y z x y z q") == 0.769231) // "x y z": 2·5/13
    assert(one(TextFunctions.topNgramCharFrac(col("t"), 2), "solo") == 0.0)
    assert(one(TextFunctions.topNgramCharFrac(col("t"), 2), "") == 0.0)
  }

  test("dupNgramFrac: repeated n-gram fraction; short docs → 0") {
    // 7 5-grams, 5 distinct ("a b c d e" and "b c d e a" repeat)
    assert(one(TextFunctions.dupNgramFrac(col("t"), 5),
      "a b c d e a b c d e a") == 0.285714)
    assert(one(TextFunctions.dupNgramFrac(col("t"), 5), "a b c d") == 0.0)
    assert(one(TextFunctions.dupNgramFrac(col("t"), 2), "a a a") == 0.5)
  }

  test("scrubPii masks emails and URLs, leaves clean text alone") {
    assert(one(TextFunctions.scrubPii(col("t")),
      "mail bob.smith+x@ex-ample.co.uk now") == "mail <EMAIL> now")
    assert(one(TextFunctions.scrubPii(col("t")),
      "see https://a.b/c?d=1 and http://x.y") == "see <URL> and <URL>")
    assert(one(TextFunctions.scrubPii(col("t")),
      "plain words only") == "plain words only")
  }

  test("url host/path/param extraction") {
    val u = "https://sub1.example.com/p/3/page?q=42&ref=r2"
    assert(one(TextFunctions.urlHost(col("t")), u) == "sub1.example.com")
    assert(one(TextFunctions.urlPath(col("t")), u) == "/p/3/page")
    assert(one(TextFunctions.urlParam(col("t"), "q"), u) == "42")
    assert(one(TextFunctions.urlParam(col("t"), "ref"), u) == "r2")
    assert(one(TextFunctions.urlParam(col("t"), "missing"), u) == null)
  }

  test("stripHtml: tags out, entities unescaped after, whitespace collapsed") {
    def strip(s: String): String =
      one(TextFunctions.stripHtml(col("t")), s).asInstanceOf[String]
    assert(strip("<p>hello <b>world</b></p>") == "hello world")
    // literal escaped markup survives as TEXT, not eaten as a tag
    assert(strip("a &lt;tag&gt; b") == "a <tag> b")
    // &amp; last: "&amp;lt;" means the literal text "&lt;"
    assert(strip("x &amp;lt; y") == "x &lt; y")
    assert(strip("<div>a</div><div>b</div>") == "a b")
    assert(strip("  <br/> spaced\t\tout  ") == "spaced out")
    assert(strip("&quot;q&quot; &#39;s&#39; &amp;") == "\"q\" 's' &")
  }

  test("winnowing: shared substring of length >= w+k-1 shares a fingerprint") {
    // k=4, w=5: guarantee threshold is 8 shared chars. Two otherwise
    // unrelated docs embed the same 12-char run; a third does not.
    def fps(s: String): Set[Long] =
      one(TextFunctions.winnowedFingerprints(col("t"), 4, 5), s)
        .asInstanceOf[scala.collection.Seq[Long]].toSet
    val shared = "CLONED-RUN-X"
    val a = fps(s"alpha beta $shared gamma delta epsilon")
    val b = fps(s"one two three four $shared five six")
    val c = fps("totally different content with no overlap at all")
    assert((a intersect b).nonEmpty, "guaranteed shared fingerprint missing")
    assert((a intersect c).isEmpty && (b intersect c).isEmpty)
  }

  test("winnowing: density ~2/(w+1), degenerate lengths well-defined") {
    def fps(s: String): Seq[Long] =
      one(TextFunctions.winnowedFingerprints(col("t"), 4, 5), s)
        .asInstanceOf[scala.collection.Seq[Long]].toSeq
    val longDoc = (1 to 100).map(i => f"tok$i%03d").mkString(" ")
    val n = fps(longDoc).size
    val grams = longDoc.length - 4 + 1
    // expected 2/(w+1) = 1/3 of gram count; allow a wide band
    assert(n > grams / 6 && n < grams / 2, s"density off: $n of $grams")
    assert(fps("").isEmpty)            // shorter than k
    assert(fps("abc").isEmpty)         // shorter than k
    assert(fps("abcd").size == 1)      // exactly one gram, fewer than w
    assert(fps("abcdef").nonEmpty)     // < w hashes -> global min only
  }

  test("valueCounts: run-length counts over the sorted array") {
    import spark.implicits._
    def vc(arr: Seq[String]): Seq[(String, Long)] =
      Seq(Tuple1(arr)).toDF("a")
        .select(explode(TextFunctions.valueCounts(col("a"))).as("p"))
        .select(col("p.v"), col("p.c")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(vc(Seq("b", "a", "b", "a", "b")) === Seq(("a", 2L), ("b", 3L)))
    assert(vc(Seq("x")) === Seq(("x", 1L)))
    assert(vc(Seq("x", "x", "x")) === Seq(("x", 3L)))
    assert(vc(Nil) === Nil)
    // equals the explode + groupBy formulation on random input
    val rnd = new scala.util.Random(3)
    val arr = (0 until 500).map(_ => rnd.nextInt(17).toString)
    val expected = arr.groupBy(identity).view
      .mapValues(_.size.toLong).toSeq.sortBy(_._1)
    assert(vc(arr) === expected)
  }

  test("filterLines: C4 rules — min words, banned substrings, terminal " +
    "punctuation") {
    import org.apache.spark.sql.functions.col
    def f(text: String, minWords: Int, banned: Seq[String] = Nil,
        punct: Boolean = false): String =
      one(TextFunctions.filterLines(col("t"), minWords, banned, punct),
        text).asInstanceOf[String]
    val doc = "a good long sentence here.\nshort one\n" +
      "enable JavaScript to continue now\nanother fine long line here!"
    // min-words rule alone
    assert(f(doc, 5) == "a good long sentence here.\n" +
      "enable JavaScript to continue now\nanother fine long line here!")
    // banned substring (case-insensitive)
    assert(f(doc, 5, Seq("javascript")) ==
      "a good long sentence here.\nanother fine long line here!")
    // terminal punctuation drops the unpunctuated survivor
    assert(f(doc, 3, Nil, punct = true) ==
      "a good long sentence here.\nanother fine long line here!")
    // all-dropped document becomes the empty string
    assert(f("tiny\nalso tiny", 5) == "")
    // blank lines never count as words
    assert(f("   \nonly this line has enough words", 5) ==
      "only this line has enough words")
  }

  test("canonicalizeUrl: one spelling per page") {
    import org.apache.spark.sql.functions.col
    def c(u: String): String =
      one(TextFunctions.canonicalizeUrl(col("t")), u).asInstanceOf[String]
    // case, www, default port, trailing slash, tracking params, param
    // order, fragment — all collapse to one canonical spelling
    val want = "https://example.com/A/B?a=1&b=2"
    assert(c("HTTPS://WWW.Example.COM:443/A/B/?b=2&a=1&utm_source=x") == want)
    assert(c("https://example.com/A/B?a=1&b=2#section") == want)
    assert(c("https://www.example.com/A/B///?a=1&b=2&fbclid=zz") == want)
    // distinct pages stay distinct
    assert(c("http://example.com/A/B?a=1&b=2") ==
      "http://example.com/A/B?a=1&b=2")
    assert(c("https://example.com/a/b?a=1&b=2") ==
      "https://example.com/a/b?a=1&b=2") // path case is significant
    // non-default port kept; query-no-path; all-tracking query drops
    assert(c("https://example.com:8443/x") == "https://example.com:8443/x")
    assert(c("https://Example.com?b=2&a=1") == "https://example.com?a=1&b=2")
    assert(c("https://example.com/p?utm_campaign=c&gclid=1") ==
      "https://example.com/p")
    assert(c("http://example.com:80/") == "http://example.com")
    // non-URL input passes through lowercased, never mangled
    assert(c("Example.com/Path#f") == "example.com/path")
    // '/' inside a query value must not re-anchor the host/path split:
    // param order still canonicalizes, tracking still strips
    assert(c("https://a.com?next=/p&utm_source=t") ==
      "https://a.com?next=/p")
    assert(c("https://a.com?utm_source=t&next=/p") ==
      "https://a.com?next=/p")
    assert(c("https://a.com/login?back=/x/y&b=2&a=1") ==
      "https://a.com/login?a=1&b=2&back=/x/y")
    // a second '?' inside the query stays query content
    assert(c("https://a.com/p?q=what?&a=1") ==
      "https://a.com/p?a=1&q=what?")
    // IPv6 bracket hosts: the address is never truncated at its first
    // colon; explicit ports survive, default ports strip, hex digits
    // lowercase like any host
    assert(c("http://[::1]:8080/p?b=2&a=1#f") ==
      "http://[::1]:8080/p?a=1&b=2")
    assert(c("https://[2001:DB8::1]/x/") == "https://[2001:db8::1]/x")
    assert(c("http://[::1]:80/x") == "http://[::1]/x")
    assert(c("https://[2001:db8::1]:443/x") == "https://[2001:db8::1]/x")
    // userinfo authorities pass through as part of the authority
    // (documented: distinct credentials are distinct dedup keys)
    assert(c("http://user@Example.com/a") == "http://user@example.com/a")
  }

  test("dedupLines keeps the FIRST occurrence, order preserved") {
    import org.apache.spark.sql.functions.col
    def d(text: String): String =
      one(TextFunctions.dedupLines(col("t")), text).asInstanceOf[String]
    assert(d("nav bar\nbody one\nnav bar\nbody two\nnav bar") ==
      "nav bar\nbody one\nbody two")
    assert(d("a\nb\nc") == "a\nb\nc")
    assert(d("x\nx\nx") == "x")
    assert(d("") == "")
    // composes with the filter: filter first, then collapse
    val composed = one(TextFunctions.dedupLines(
      TextFunctions.filterLines(col("t"), 2)),
      "keep me\nno\nkeep me\nme too").asInstanceOf[String]
    assert(composed == "keep me\nme too")
  }

  test("qualityLogitMicro: exact integer logit, prose above garbage, " +
    "shouting and punctuation noise penalized") {
    import spark.implicits._
    def logit(t: String): Long =
      Seq(t).toDF("text")
        .select(TextFunctions.qualityLogitMicro(col("text")).as("l"))
        .head().getLong(0)
    // hand-computed: "the cat sat in the mat" — lc=22, t=6, st=3
    // (the, in, the), pu=0, up=0; stopU=500000, wlenM=3666
    // logit = -260000 + 1500000 + 0 - 0 + 5400 - 150*|3666-5500|
    //       = -260000 + 1500000 + 5400 - 275100 = 970300
    assert(logit("the cat sat in the mat") == 970300L)
    val prose = "the quick brown fox jumps over the lazy dog and " +
      "it runs for the hills in a hurry that is quite fast"
    val garbage = "@@@@ ###### !!!! %%%% ^^^^ &&&& **** ((()))) ::: ;;;"
    val shouting = "BUY NOW BEST DEAL EVER CLICK HERE LIMITED OFFER"
    assert(logit(prose) > 0, s"prose must pass: ${logit(prose)}")
    assert(logit(garbage) < logit(prose) && logit(garbage) < 0,
      s"punctuation noise must fail: ${logit(garbage)}")
    assert(logit(shouting) < logit(prose),
      s"shouting is penalized: ${logit(shouting)}")
  }
}
