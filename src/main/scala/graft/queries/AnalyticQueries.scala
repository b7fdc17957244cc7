package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, MapType, StringType}

import graft.core.Lake

/** Analytic-surface gates widening SURVEY.md §2.4–§2.6: PIVOT/UNPIVOT,
  * CUBE grouping sets, exact quantiles (cont + disc + median), map-typed
  * columns (F7), edit distance, and a seeded stratified sample checked as
  * a statistical property. All plans are plain shuffles/aggregations —
  * nothing here degrades at scale (pivot widens columns, not rows; cube
  * is Catalyst Expand; quantiles are a single sort-based agg per group).
  */
object AnalyticQueries {

  /** A7: PIVOT — per user-id bucket, one count column per event type.
    * Pivot values are pinned explicitly so the output schema is static
    * (at 100 TB a dynamic pivot would need a driver-side distinct scan
    * first; pinning removes that job). Empty cells coalesce to 0.
    */
  def a7Pivot(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val base = Lake.table(spark, dir, "events")
      .groupBy((col("user_id") % 10).as("bucket"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
    types.foldLeft(base)((df, t) =>
        df.withColumn(t, coalesce(col(t), lit(0L))))
      .orderBy(col("bucket"))
  }

  /** A8: CUBE grouping sets over two dims with cents-exact money sums. */
  def a8Cube(spark: SparkSession, dir: String): DataFrame =
    Lake.table(spark, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("c"),
        (sum(round(col("l_extendedprice") * 100).cast("long")) / 100.0)
          .as("revenue"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  /** A9: UNPIVOT (wide metrics → long) of a per-flag aggregate. */
  def a9Unpivot(spark: SparkSession, dir: String): DataFrame =
    Lake.table(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        (sum(round(col("l_quantity") * 100).cast("long")) / 100.0).as("qty"),
        (sum(round(col("l_discount") * 100).cast("long")) / 100.0).as("disc"))
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("qty"), col("disc")),
        "metric", "val")
      .orderBy(col("l_returnflag"), col("metric"))

  /** A10: seeded stratified sample (`sampleBy`) — engines can't share a
    * sampler, so the gate checks the PROPERTY: the per-stratum sampled
    * count is within ±35% of the 10% target (≥5 sigma at sf0.001's
    * ~200-row strata). The oracle verifies strata + the boolean contract.
    */
  def a10StratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val events = Lake.table(spark, dir, "events")
    val types = Seq("click", "error", "purchase", "signup", "view")
    val sampled = events.stat
      .sampleBy("event_type", types.map(_ -> 0.1).toMap, 42L)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val totals = events.groupBy(col("event_type"))
      .agg(count(lit(1)).as("total"))
    totals.join(sampled, Seq("event_type"), "left")
      .select(col("event_type"), col("total"),
        (abs(coalesce(col("n"), lit(0L)) - col("total") * 0.1) <=
          col("total") * 0.035 + 20.0).as("ok"))
      .orderBy(col("event_type"))
  }

  /** F7: map-typed columns — parse props JSON into MAP<STRING,BIGINT>,
    * explode entries, aggregate per (event_type, key). The keys come from
    * the DATA on both engines (json_keys in DuckDB), not a hardcoded list.
    */
  def f7MapFunctions(spark: SparkSession, dir: String): DataFrame =
    Lake.table(spark, dir, "events")
      .select(col("event_type"),
        from_json(col("props"), MapType(StringType, LongType)).as("m"))
      .select(col("event_type"), explode(col("m")).as(Seq("key", "val")))
      .groupBy(col("event_type"), col("key"))
      .agg(count(lit(1)).as("c"), sum(col("val")).as("s"),
        min(col("val")).as("mn"), max(col("val")).as("mx"))
      .orderBy(col("event_type"), col("key"))

  /** F8: exact quantiles — interpolated (percentile_cont ≡ percentile)
    * at 0.25/0.75, discrete at 0.5 (the one probe point where Spark's
    * ceil(p·n) and DuckDB's floor(p·(n−1))+1 index rules provably agree
    * for every n), plus median. Sort-based agg per group; at scale this
    * is the exact path — approx_percentile (A3-style sketch) is the
    * 100 TB default and is property-tested in the spec instead.
    */
  def f8Quantiles(spark: SparkSession, dir: String): DataFrame =
    Lake.table(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        median(col("l_quantity")).as("med_qty"),
        percentile(col("l_extendedprice"), lit(0.25)).as("p25_price"),
        percentile(col("l_extendedprice"), lit(0.75)).as("p75_price"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)")
          .as("p50_disc"))
      .orderBy(col("l_returnflag"))

  /** F9: edit distance (fuzzy matching for curation) — levenshtein
    * between each part's name and type, bucketed into a distance
    * histogram per brand. Codegen'd binary string expression; no joins.
    */
  def f9EditDistance(spark: SparkSession, dir: String): DataFrame =
    Lake.table(spark, dir, "part")
      .select(col("p_brand"),
        levenshtein(col("p_name"), col("p_type")).as("d"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("c"), min(col("d")).cast("long").as("dmin"),
        max(col("d")).cast("long").as("dmax"),
        sum(col("d")).cast("long").as("dsum"))
      .orderBy(col("p_brand"))

  /** W4: explicit window frames — a ROWS 3-preceding moving sum/avg and a
    * RANGE 1-hour-preceding time frame (numeric rangeBetween over epoch
    * micros — the portable formulation of a time-range frame). Frame sums
    * use integer cents so the moving averages are division-exact.
    */
  def w4Frames(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows4 = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-3, Window.currentRow)
    val hour = Window.partitionBy(col("user_id"))
      .orderBy(col("us"))
      .rangeBetween(-3600000000L, Window.currentRow)
    Lake.table(spark, dir, "events")
      .filter(col("user_id") < 3)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .select(col("event_id"), col("user_id"),
        sum(col("cents")).over(rows4).as("mv_sum"),
        count(lit(1)).over(rows4).as("mv_n"),
        (sum(col("cents")).over(rows4) / 100.0 /
          count(lit(1)).over(rows4)).as("mv_avg"),
        sum(col("cents")).over(hour).as("hr_sum"),
        count(lit(1)).over(hour).as("hr_n"))
      .orderBy(col("event_id"))
  }

  /** W5: the ranking family — ntile, percent_rank, cume_dist,
    * first/last/nth_value over a TOTAL order (value, event_id), so tie
    * handling can't differ between engines. last_value needs the
    * full-partition frame (default frame stops at CURRENT ROW).
    */
  def w5RankFamily(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Lake.table(spark, dir, "events")
      .filter(col("user_id") < 2)
      .select(col("event_id"), col("event_type"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"),
        first(col("event_id")).over(full).as("first_id"),
        last(col("event_id")).over(full).as("last_id"),
        nth_value(col("event_id"), 2).over(full).as("second_id"))
      .orderBy(col("event_id"))
  }

  /** F10: regexp extraction — capture groups and global match counts,
    * with a pattern that means the same thing in Java regex and RE2.
    */
  def f10Regexp(spark: SparkSession, dir: String): DataFrame =
    Lake.table(spark, dir, "part")
      .select(
        regexp_extract(col("p_name"), "([a-z]+) ([a-z]+)", 2).as("noun"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("adj"),
        length(regexp_replace(col("p_name"), "[aeiou]", "")).as("consonants"))
      .groupBy(col("noun"))
      .agg(count(lit(1)).as("c"),
        countDistinct(col("adj")).as("adjs"),
        sum(col("consonants")).cast("long").as("cons"))
      .orderBy(col("noun"))

  /** F11: array functions — split, sort, dedup, slice, join, contains —
    * over the token array of p_name; array values compare exactly.
    */
  def f11Arrays(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("p_name"), " ")
    Lake.table(spark, dir, "part")
      .select(col("p_partkey"), toks.as("toks"))
      .filter(col("p_partkey") < 50)
      .select(col("p_partkey"),
        size(col("toks")).cast("long").as("n"),
        array_join(array_sort(col("toks")), "-").as("sorted_joined"),
        // Scalar, not a raw array: the verify harness canonicalizes row
        // order via a pandas sort, which cannot hash array cells.
        element_at(array_sort(col("toks")), 1).as("head1"),
        array_contains(col("toks"), "widget").as("has_widget"))
      .orderBy(col("p_partkey"))
  }

  /** A11: statistical aggregates (corr, stddev) computed from EXACT
    * integer power sums (Σx, Σy, Σxy, Σx², Σy² over cents/ids), with the
    * float math confined to one final projection over those integers —
    * the formulation that is bitwise-reproducible on any engine AND
    * single-pass/mergeable at 100 TB (each partial is 6 longs). The
    * built-in corr/stddev_pop are proven equal to this formula (1e-9) in
    * AnalyticQueriesSpec.
    */
  def a11Stats(spark: SparkSession, dir: String): DataFrame =
    Lake.table(spark, dir, "events")
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("x"),
        col("user_id").as("y"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("event_type"), col("n"),
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
            sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))), 9)
          .as("corr_xy"),
        round(sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) /
          col("n") / 100.0, 9).as("sd_value"))
      .orderBy(col("event_type"))

  /** A12: arbitrary GROUPING SETS with grouping() null-vs-group markers,
    * driven through the SQL surface (EP2) — the same text runs on both
    * engines verbatim. Catalyst plans it as one Expand, same as rollup.
    */
  def a12GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Lake.table(spark, dir, "lineitem").createOrReplaceTempView("lineitem")
    spark.sql(GroupingSetsSql)
  }

  private val GroupingSetsSql =
    """SELECT l_returnflag, l_linestatus,
      |  grouping(l_returnflag) AS g_rf, grouping(l_linestatus) AS g_ls,
      |  count(*) AS c,
      |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE) / 100.0 AS rev
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** F12: null-handling family — nullif/coalesce/nvl over synthesized
    * nulls (the corpus itself is null-free), plus null-aware counts.
    */
  def f12NullFunctions(spark: SparkSession, dir: String): DataFrame =
    Lake.table(spark, dir, "orders")
      .select(col("o_orderpriority"),
        nullif(col("o_orderstatus"), lit("F")).as("st"),
        when(col("o_totalprice") > 150000, col("o_totalprice")).as("big"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        count(col("st")).as("non_f"),
        sum(when(col("st").isNull, 1L).otherwise(0L)).as("f_cnt"),
        count(col("big")).as("bigs"),
        (sum(round(coalesce(col("big"), lit(0.0)) * 100).cast("long")) / 100.0)
          .as("big_sum"))
      .orderBy(col("o_orderpriority"))

  /** F13: date/time component extraction + day arithmetic + interval
    * shift — the portable subset (year..second, datediff, fixed-width
    * intervals). Month arithmetic (add_months) is deliberately NOT gated:
    * end-of-month clamping differs across engines.
    */
  def f13Datetime(spark: SparkSession, dir: String): DataFrame =
    Lake.table(spark, dir, "events")
      .filter(col("user_id") < 2)
      .select(col("event_id"),
        year(col("ts")).cast("long").as("y"),
        month(col("ts")).cast("long").as("mo"),
        dayofmonth(col("ts")).cast("long").as("d"),
        hour(col("ts")).cast("long").as("h"),
        minute(col("ts")).cast("long").as("mi"),
        second(col("ts")).cast("long").as("s"),
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
          .cast("long").as("days_in"),
        (col("ts") + expr("INTERVAL 90 MINUTES")).as("shifted"))
      .orderBy(col("event_id"))

  /** F8b: approx_percentile — the 100 TB quantile path (mergeable KLL-ish
    * sketch, O(accuracy) state vs the exact path's full sort). Sketches
    * differ across engines, so the gate checks the PROPERTY (a3 pattern):
    * the approximate median must land between the exact p45 and p55 —
    * at accuracy 10000 the rank error is ≤ n/10000, orders of magnitude
    * inside that band. The band endpoints themselves are exact
    * percentile_cont values both engines agree on bitwise.
    */
  def f8bApproxQuantiles(spark: SparkSession, dir: String): DataFrame =
    Lake.table(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("ap50"),
        percentile(col("l_extendedprice"), lit(0.45)).as("p45"),
        percentile(col("l_extendedprice"), lit(0.55)).as("p55"))
      .select(col("l_returnflag"), col("n"), col("p45"), col("p55"),
        (col("ap50") >= col("p45") && col("ap50") <= col("p55")).as("ok"))
      .orderBy(col("l_returnflag"))

  /** F13b: month-interval arithmetic, gated on CLAMP-FREE dates (day ≤
    * 28) where every engine agrees — the common `+ INTERVAL n MONTH` case
    * users actually hit. End-of-month clamping divergence is why f13
    * excludes months; this covers the portable subset explicitly.
    */
  def f13bMonthArith(spark: SparkSession, dir: String): DataFrame =
    Lake.table(spark, dir, "events")
      .filter(col("user_id") < 2 && dayofmonth(col("ts")) <= 28)
      .select(col("event_id"),
        add_months(col("ts").cast("date"), 1).cast("timestamp").as("m1"),
        add_months(col("ts").cast("date"), 13).cast("timestamp").as("m13"),
        (col("ts") + expr("INTERVAL 2 MONTHS")).as("m2_ts"))
      .orderBy(col("event_id"))

  /** F15: URL structure extraction (host/path/query-param) via native
    * parse_url. The corpus carries no URL column, so each doc contributes
    * a deterministic id-derived URL (l4_scrub_pii's augmentation trick);
    * the oracle re-extracts the same fields with Java≡RE2-safe regexes.
    */
  def f15Url(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    val url = concat(lit("https://sub"), (col("doc_id") % 5).cast("string"),
      lit(".example.com/p/"), (col("doc_id") % 7).cast("string"),
      lit("/page?q="), (col("doc_id") % 11).cast("string"),
      lit("&ref=r"), (col("doc_id") % 3).cast("string"))
    Lake.table(spark, dir, "documents")
      .select(url.as("url"))
      .select(
        TextFunctions.urlHost(col("url")).as("host"),
        TextFunctions.urlPath(col("url")).as("path"),
        TextFunctions.urlParam(col("url"), "q").cast("long").as("q"),
        TextFunctions.urlParam(col("url"), "ref").as("ref"))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("c"),
        countDistinct(col("path")).as("paths"),
        sum(col("q")).as("sq"),
        countDistinct(col("ref")).as("refs"))
      .orderBy(col("host"))
  }

  /** A13: cohort retention — users grouped by first-seen day, distinct
    * active users per (cohort, day offset ≤ 7). The first-seen table is
    * a per-user aggregate joined back on user_id (AQE broadcasts it
    * while small; at scale it's one key shuffle) — all-integer output
    * plus date keys.
    */
  def a13Cohort(spark: SparkSession, dir: String): DataFrame = {
    val e = Lake.table(spark, dir, "events")
      .select(col("user_id"), col("ts").cast("date").as("d"))
    val first = e.groupBy(col("user_id")).agg(min(col("d")).as("cohort"))
    e.join(first, "user_id")
      .select(col("user_id"), col("cohort"),
        datediff(col("d"), col("cohort")).cast("long").as("day_offset"))
      .filter(col("day_offset") <= 7)
      .groupBy(
        // As timestamp, not date: the driver reads Spark's parquet DATE
        // as pandas object but DuckDB dates as datetime64 — dtype skew.
        col("cohort").cast("timestamp").as("cohort"),
        col("day_offset"))
      .agg(countDistinct(col("user_id")).as("users"))
      .orderBy(col("cohort"), col("day_offset"))
  }

  /** A14: ordered funnel view → click → purchase: stage n counts users
    * whose earliest qualifying event strictly follows their stage-(n−1)
    * time. Timestamps compare as epoch micros (the portable ns→µs
    * convention). Each stage is one aggregate + one key join — no
    * windows over the full event stream.
    */
  def a14Funnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Lake.table(spark, dir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    def stage(base: DataFrame, evt: String): DataFrame =
      e.filter(col("event_type") === evt)
        .join(base.select(col("user_id"), col("t").as("t_prev")), "user_id")
        .filter(col("us") > col("t_prev"))
        .groupBy(col("user_id")).agg(min(col("us")).as("t"))
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("t"))
    val c = stage(v, "click")
    val p = stage(c, "purchase")
    Seq(("1_view", v), ("2_click", c), ("3_purchase", p))
      .map { case (name, df) =>
        df.agg(count(lit(1)).as("users")).select(lit(name).as("stage"), col("users"))
      }
      .reduce(_ unionAll _)
      .orderBy(col("stage"))
  }

  /** A15: winsorized aggregation — clamp prices to per-group exact
    * [p5, p95] (Curation.winsorize: quantile agg + broadcast join-back,
    * not a percentile window), then roll up. Spark percentile ≡ DuckDB
    * quantile_cont interpolation is already pinned by f8.
    */
  def a15Winsorize(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Curation.winsorize(
        Lake.table(spark, dir, "lineitem"),
        "l_extendedprice", Seq("l_returnflag"), 0.05, 0.95)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("c"),
        (sum(round(col("l_extendedprice_w") * 100).cast("long")) / 100.0).as("s"),
        round(min(col("l_extendedprice_w")) * 100).cast("long").as("mn_c"),
        round(max(col("l_extendedprice_w")) * 100).cast("long").as("mx_c"))
      .orderBy(col("l_returnflag"))

  /** A16: event-transition (Markov) counts — per-user lag over
    * (ts, event_id)-pinned order, then a grouped count per
    * (prev, next) edge. One window shuffle on user_id + one agg.
    */
  def a16Transitions(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Lake.table(spark, dir, "events")
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("event_type"))
      .agg(count(lit(1)).as("c"), countDistinct(col("user_id")).as("users"))
      .orderBy(col("prev"), col("event_type"))
  }

  /** A17: skyline (Pareto frontier) of part on (min price, max size) —
    * the linear window formulation: per-price max size, running max over
    * strictly-lower prices, keep rows dominated by neither. The oracle is
    * the O(n²) NOT EXISTS dominance definition, so the gate proves the
    * linear plan computes exactly the textbook skyline.
    *
    * The prefix-max is two-phase so no single task ever scans the whole
    * price domain: range-partition the distinct prices, run the running
    * max per partition in parallel, then lift each row's prefix to global
    * with the broadcast per-partition boundary maxima (N_partitions rows
    * — the only cross-partition state). Range partitions are ordered by
    * key, so every earlier partition holds strictly lower prices and
    * `greatest(local prefix, max of earlier partitions)` is exactly the
    * global strict-prefix max.
    */
  def a17Skyline(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = Lake.table(spark, dir, "part")
      .select(col("p_partkey"), col("p_retailprice").as("price"),
        col("p_size").cast("long").as("sz"))
    val nPart = spark.sparkContext.defaultParallelism
    val ranged = p.groupBy(col("price")).agg(max(col("sz")).as("mx"))
      .repartitionByRange(nPart, col("price"))
      .withColumn("pid", spark_partition_id())
    val wLocal = Window.partitionBy(col("pid")).orderBy(col("price"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = ranged.withColumn("local_below", max(col("mx")).over(wLocal))
    // Per-partition boundary maxima: N_partitions rows. The strict-prior
    // max per pid is a broadcast self-join on pid inequality (N² over
    // metadata-sized N — never a data-sized nested loop).
    val bounds = local.groupBy(col("pid")).agg(max(col("mx")).as("pmax"))
    val prior = bounds.select(col("pid"))
      .join(broadcast(bounds.select(col("pid").as("ppid"), col("pmax"))),
        col("ppid") < col("pid"), "left")
      .groupBy(col("pid")).agg(max(col("pmax")).as("prior_max"))
    val perPrice = local.join(broadcast(prior), Seq("pid"))
      // greatest() skips nulls: null only when both are (global first row)
      .withColumn("mx_below", greatest(col("local_below"), col("prior_max")))
    p.join(perPrice, "price")
      .filter(col("sz") === col("mx") &&
        (col("mx_below").isNull || col("mx_below") < col("sz")))
      .select(col("p_partkey"),
        round(col("price") * 100).cast("long").as("price_cents"), col("sz"))
      .orderBy(col("p_partkey"))
  }

  /** A18: time-series gap filling — daily activity per user densified
    * over a generated calendar spine (sequence + explode ⋈ per-user
    * counts, zeros for silent days). The spine is dims × days — generated,
    * never scanned; the fact side is one grouped aggregate.
    */
  def a18Gapfill(spark: SparkSession, dir: String): DataFrame = {
    val daily = Lake.table(spark, dir, "events")
      .filter(col("user_id") < 5)
      .groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("c"))
    // derive the user set from the aggregate already in hand — one scan
    // of events, not two
    val spine = daily.select(col("user_id")).distinct()
      .crossJoin(spark.range(1).select(explode(sequence(
        to_date(lit("2024-01-01")), to_date(lit("2024-01-30")))).as("d")))
    spine.join(daily, Seq("user_id", "d"), "left_outer")
      .select(col("user_id"), col("d").cast("timestamp").as("d"),
        coalesce(col("c"), lit(0L)).as("c"))
      .orderBy(col("user_id"), col("d"))
  }

  /** A19: grouped top-k via the mergeable TopKByScore heap aggregate —
    * O(k) state per group to the shuffle instead of a per-group sort;
    * the custom aggregate itself checked against the row_number oracle
    * (score desc, id asc tie-break — the aggregate's documented order).
    */
  def a19TopkGroup(spark: SparkSession, dir: String): DataFrame =
    Lake.table(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(graft.plans.TopKByScore
        .top_k_by_score(col("o_totalprice"), col("o_orderkey"), 3).as("top"))
      .select(col("o_orderpriority"), posexplode(col("top")).as(Seq("r", "e")))
      .select(col("o_orderpriority"), (col("r") + 1).cast("long").as("rnk"),
        col("e.id").as("o_orderkey"),
        round(col("e.score") * 100).cast("long").as("price_cents"))
      .orderBy(col("o_orderpriority"), col("rnk"))

  /** A20: forward-fill (LOCF) interpolation — the gap-fill variant for
    * STATE-like series: a held value (price, sensor reading) carries
    * through silent days, where a18's zero-fill is for count-like
    * series. One ignore-nulls `last` window over the spine-joined frame
    * — no self-join, no per-gap scan; days before a user's first
    * observation stay null (both engines). Money canonicalized as
    * integer cents before the single final division.
    */
  def a20Locf(spark: SparkSession, dir: String): DataFrame = {
    val daily = Lake.table(spark, dir, "events")
      .filter(col("user_id") < 5)
      .groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .agg((sum(round(col("value") * 100).cast("long")) / 100.0).as("v"))
    val spine = daily.select(col("user_id")).distinct()
      .crossJoin(spark.range(1).select(explode(sequence(
        to_date(lit("2024-01-01")), to_date(lit("2024-01-30")))).as("d")))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("user_id", "d"), "left_outer")
      .select(col("user_id"), col("d").cast("timestamp").as("d"),
        last(col("v"), ignoreNulls = true).over(w).as("v"))
      .orderBy(col("user_id"), col("d"))
  }

  /** F16: schema-enforced JSON parsing with malformed-record accounting —
    * from_json(struct) returns null for rows whose props were
    * deterministically corrupted, and the gate counts corrupt vs parsed
    * per type (the ingestion-boundary behavior q09's path never sees).
    */
  def f16FromJson(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    Lake.table(spark, dir, "events")
      // corruption PREPENDED: Spark's Jackson parser ignores trailing
      // garbage after a complete JSON value, so suffix corruption would
      // not make the parse fail
      .withColumn("raw",
        when(col("event_id") % 13 === 0, concat(lit("#"), col("props")))
          .otherwise(col("props")))
      .withColumn("p",
        from_json(col("raw"), StructType(Seq(StructField("k", IntegerType)))))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("c"),
        sum(when(col("p").isNull || col("p.k").isNull, 1L).otherwise(0L))
          .as("corrupt"),
        sum(coalesce(col("p.k"), lit(0)).cast("long")).as("k_sum"))
      .orderBy(col("event_type"))
  }

  /** W7: running DISTINCT count over a window — Spark windows don't
    * support count(DISTINCT) directly; the standard rewrite is
    * size(collect_set(...)), proven here equal to DuckDB's native
    * windowed count(DISTINCT). State is the distinct set per frame —
    * fine for bounded-cardinality columns (suppliers here); at high
    * cardinality the HLL sketch union is the scale path.
    */
  def w7WindowedDistinct(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // RANGE frame over one derived ordering key: (orderkey, linenumber)
    // pairs DUPLICATE in this corpus, so a ROWS frame would depend on
    // the arbitrary order among peers (3 rows diverged cross-engine
    // before the switch); RANGE includes all peers in every peer's
    // frame, making the running value order-independent.
    val w = Window.partitionBy(col("l_returnflag")).orderBy(col("ok"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    Lake.table(spark, dir, "lineitem")
      .filter(col("l_orderkey") < 300)
      .withColumn("ok", col("l_orderkey") * 10 + col("l_linenumber"))
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        size(collect_set(col("l_suppkey")).over(w)).cast("long")
          .as("run_distinct_supp"))
      .orderBy(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("run_distinct_supp"))
  }

  /** F17: the bitwise function family — and/or/xor, shifts, bit_count,
    * negation — integer-exact on both engines, summed per group.
    */
  def f17Bitwise(spark: SparkSession, dir: String): DataFrame =
    Lake.table(spark, dir, "lineitem")
      .filter(col("l_orderkey") < 2000)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("c"),
        sum(col("l_partkey").bitwiseAND(col("l_suppkey"))).as("s_and"),
        sum(col("l_partkey").bitwiseOR(col("l_suppkey"))).as("s_or"),
        sum(col("l_partkey").bitwiseXOR(col("l_suppkey"))).as("s_xor"),
        sum(shiftleft(col("l_linenumber"), 3).cast("long")).as("s_shl"),
        sum(shiftright(col("l_partkey"), 2)).as("s_shr"),
        sum(bit_count(col("l_partkey")).cast("long")).as("s_pop"))
      .orderBy(col("l_returnflag"))

  /** F18: transcendental/math scalar family — ln, exp, sqrt, sin, cos,
    * log10, atan. Every per-row value is rounded to 6dp and summed as
    * exact DECIMAL (the l4_quality discipline): libm differences live at
    * ~1 ulp (≈1e-16), far below the 6dp gate, and the DECIMAL sum makes
    * aggregation order irrelevant. sqrt is IEEE-correctly-rounded on any
    * engine; the rest are pinned by the rounding.
    */
  def f18Math(spark: SparkSession, dir: String): DataFrame = {
    val dec = (c: org.apache.spark.sql.Column) =>
      sum(round(c, 6).cast("decimal(24,6)")).cast("double")
    Lake.table(spark, dir, "lineitem")
      .filter(col("l_orderkey") < 2000)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("c"),
        dec(log(lit(1.0) + col("l_quantity"))).as("s_ln"),
        dec(exp(-col("l_discount"))).as("s_exp"),
        dec(sqrt(col("l_extendedprice"))).as("s_sqrt"),
        dec(sin(col("l_linenumber").cast("double"))).as("s_sin"),
        dec(cos(col("l_quantity"))).as("s_cos"),
        dec(log10(col("l_extendedprice"))).as("s_log10"),
        dec(atan(col("l_tax"))).as("s_atan"))
      .orderBy(col("l_returnflag"))
  }

  /** W8: grouped top-k through the RewriteTopKWindow optimizer rule —
    * the `row_number() <= k` window idiom rewritten to the O(k)-per-group
    * heap aggregate (plans.TopKRowsAgg). The rule is applied explicitly
    * to THIS query's analyzed plan (Bridge.ofRows), not installed
    * session-wide, and the gate `require`s that the Window is actually
    * gone — so a silently-declined rewrite fails the gate rather than
    * passing on the unrewritten plan. Total ordering (price DESC, key) ⇒
    * deterministic; the DuckDB oracle runs the plain window SQL.
    */
  def w8TopkRewrite(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Lake.table(spark, dir, "orders")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .filter(col("rn") <= 5)
      .select(col("o_orderpriority"), col("o_orderkey"),
        col("o_totalprice"), col("rn"))
    // Applied to the OPTIMIZED plan: predicate pushdown has already moved
    // the rank filter flush against the Window there — the shape the rule
    // matches (and sees when installed in the optimizer proper).
    val rewritten = graft.plans.RewriteTopKWindow(base.queryExecution.optimizedPlan)
    require(rewritten.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.isEmpty, "RewriteTopKWindow did not fire")
    org.apache.spark.sql.graftbridge.Bridge.ofRows(spark, rewritten)
      .orderBy(col("o_orderpriority"), col("rn"))
  }

  val all: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "w8_topk_rewrite"      -> (w8TopkRewrite _),
    "f18_math"             -> (f18Math _),
    "a15_winsorize"        -> (a15Winsorize _),
    "a16_transitions"      -> (a16Transitions _),
    "a17_skyline"          -> (a17Skyline _),
    "a18_gapfill"          -> (a18Gapfill _),
    "a19_topk_group"       -> (a19TopkGroup _),
    "a20_locf"             -> (a20Locf _),
    "f16_from_json"        -> (f16FromJson _),
    "f17_bitwise"          -> (f17Bitwise _),
    "w7_windowed_distinct" -> (w7WindowedDistinct _),
    "a7_pivot"             -> (a7Pivot _),
    "a8_cube"              -> (a8Cube _),
    "a9_unpivot"           -> (a9Unpivot _),
    "a10_stratified_sample" -> (a10StratifiedSample _),
    "f7_map_functions"     -> (f7MapFunctions _),
    "f8_quantiles"         -> (f8Quantiles _),
    "f9_edit_distance"     -> (f9EditDistance _),
    "w4_frames"            -> (w4Frames _),
    "w5_rank_family"       -> (w5RankFamily _),
    "f10_regexp"           -> (f10Regexp _),
    "f11_arrays"           -> (f11Arrays _),
    "a11_stats"            -> (a11Stats _),
    "a12_grouping_sets"    -> (a12GroupingSets _),
    "f12_null_functions"   -> (f12NullFunctions _),
    "f13_datetime"         -> (f13Datetime _),
    "f8b_approx_quantiles" -> (f8bApproxQuantiles _),
    "f13b_month_arith"     -> (f13bMonthArith _),
    "f15_url"              -> (f15Url _),
    "a13_cohort"           -> (a13Cohort _),
    "a14_funnel"           -> (a14Funnel _))

  val oracle: Map[String, String] = Map(
    "a15_winsorize" ->
      """WITH q AS (SELECT l_returnflag,
        |    quantile_cont(l_extendedprice, 0.05) AS lo,
        |    quantile_cont(l_extendedprice, 0.95) AS hi
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, count(*) AS c,
        |  sum(CAST(round(least(greatest(l_extendedprice, lo), hi) * 100)
        |    AS BIGINT)) / 100.0 AS s,
        |  CAST(round(min(least(greatest(l_extendedprice, lo), hi)) * 100)
        |    AS BIGINT) AS mn_c,
        |  CAST(round(max(least(greatest(l_extendedprice, lo), hi)) * 100)
        |    AS BIGINT) AS mx_c
        |FROM lineitem JOIN q USING (l_returnflag)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "w7_windowed_distinct" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber,
        |  CAST(count(DISTINCT l_suppkey) OVER (
        |    PARTITION BY l_returnflag
        |    ORDER BY l_orderkey * 10 + l_linenumber
        |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS run_distinct_supp
        |FROM lineitem WHERE l_orderkey < 300
        |ORDER BY 1, 2, 3, 4""".stripMargin,
    // The plain window SQL — the semantics the rewrite must preserve.
    "w8_topk_rewrite" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 5 ORDER BY o_orderpriority, rn""".stripMargin,
    "f18_math" ->
      """SELECT l_returnflag, count(*) AS c,
        |  CAST(sum(CAST(round(ln(1.0 + l_quantity), 6) AS DECIMAL(24,6))) AS DOUBLE) AS s_ln,
        |  CAST(sum(CAST(round(exp(-l_discount), 6) AS DECIMAL(24,6))) AS DOUBLE) AS s_exp,
        |  CAST(sum(CAST(round(sqrt(l_extendedprice), 6) AS DECIMAL(24,6))) AS DOUBLE) AS s_sqrt,
        |  CAST(sum(CAST(round(sin(CAST(l_linenumber AS DOUBLE)), 6) AS DECIMAL(24,6))) AS DOUBLE) AS s_sin,
        |  CAST(sum(CAST(round(cos(l_quantity), 6) AS DECIMAL(24,6))) AS DOUBLE) AS s_cos,
        |  CAST(sum(CAST(round(log10(l_extendedprice), 6) AS DECIMAL(24,6))) AS DOUBLE) AS s_log10,
        |  CAST(sum(CAST(round(atan(l_tax), 6) AS DECIMAL(24,6))) AS DOUBLE) AS s_atan
        |FROM lineitem WHERE l_orderkey < 2000
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "f17_bitwise" ->
      """SELECT l_returnflag, count(*) AS c,
        |  CAST(sum(l_partkey & l_suppkey) AS BIGINT) AS s_and,
        |  CAST(sum(l_partkey | l_suppkey) AS BIGINT) AS s_or,
        |  CAST(sum(xor(l_partkey, l_suppkey)) AS BIGINT) AS s_xor,
        |  CAST(sum(l_linenumber << 3) AS BIGINT) AS s_shl,
        |  CAST(sum(l_partkey >> 2) AS BIGINT) AS s_shr,
        |  CAST(sum(bit_count(l_partkey)) AS BIGINT) AS s_pop
        |FROM lineitem WHERE l_orderkey < 2000
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "a19_topk_group" ->
      """WITH r AS (SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders)
        |SELECT o_orderpriority, CAST(rnk AS BIGINT) AS rnk, o_orderkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
        |FROM r WHERE rnk <= 3 ORDER BY 1, 2""".stripMargin,
    "f16_from_json" ->
      """WITH e AS (SELECT event_type,
        |    CASE WHEN event_id % 13 = 0 THEN '#' || props
        |         ELSE props END AS raw
        |  FROM events)
        |SELECT event_type, count(*) AS c,
        |  CAST(sum(CASE WHEN NOT json_valid(raw)
        |      OR json_extract_string(raw, '$.k') IS NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS corrupt,
        |  CAST(sum(CASE WHEN json_valid(raw)
        |      AND json_extract_string(raw, '$.k') IS NOT NULL
        |    THEN CAST(json_extract_string(raw, '$.k') AS BIGINT)
        |    ELSE 0 END) AS BIGINT) AS k_sum
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,
    "a18_gapfill" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events WHERE user_id < 5),
        |days AS (SELECT CAST(unnest(generate_series(DATE '2024-01-01',
        |    DATE '2024-01-30', INTERVAL 1 DAY)) AS DATE) AS d),
        |daily AS (SELECT user_id, CAST(ts AS DATE) AS d, count(*) AS c
        |  FROM events WHERE user_id < 5 GROUP BY 1, 2)
        |SELECT u.user_id, CAST(days.d AS TIMESTAMP) AS d,
        |  coalesce(daily.c, 0) AS c
        |FROM u CROSS JOIN days
        |LEFT JOIN daily ON daily.user_id = u.user_id AND daily.d = days.d
        |ORDER BY 1, 2""".stripMargin,
    "a20_locf" ->
      """WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS d,
        |    sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS v
        |  FROM events WHERE user_id < 5 GROUP BY 1, 2),
        |u AS (SELECT DISTINCT user_id FROM daily),
        |days AS (SELECT CAST(unnest(generate_series(DATE '2024-01-01',
        |    DATE '2024-01-30', INTERVAL 1 DAY)) AS DATE) AS d),
        |j AS (SELECT u.user_id, days.d, daily.v
        |  FROM u CROSS JOIN days
        |  LEFT JOIN daily ON daily.user_id = u.user_id AND daily.d = days.d)
        |SELECT user_id, CAST(d AS TIMESTAMP) AS d,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
        |FROM j ORDER BY user_id, d""".stripMargin,
    "a16_transitions" ->
      """WITH t AS (SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev
        |  FROM events)
        |SELECT prev, event_type, count(*) AS c,
        |  count(DISTINCT user_id) AS users
        |FROM t WHERE prev IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "a17_skyline" ->
      """SELECT p_partkey,
        |  CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
        |  CAST(p_size AS BIGINT) AS sz
        |FROM part p
        |WHERE NOT EXISTS (SELECT 1 FROM part q
        |  WHERE (q.p_retailprice < p.p_retailprice AND q.p_size >= p.p_size)
        |     OR (q.p_retailprice <= p.p_retailprice AND q.p_size > p.p_size))
        |ORDER BY p_partkey""".stripMargin,
    "a13_cohort" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
        |f AS (SELECT user_id, min(d) AS cohort FROM e GROUP BY 1)
        |SELECT CAST(cohort AS TIMESTAMP) AS cohort,
        |  date_diff('day', cohort, d) AS day_offset,
        |  count(DISTINCT e.user_id) AS users
        |FROM e JOIN f USING (user_id)
        |WHERE date_diff('day', cohort, d) <= 7
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "a14_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us
        |  FROM events),
        |v AS (SELECT user_id, min(us) AS t FROM ev
        |      WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT ev.user_id, min(ev.us) AS t FROM ev
        |      JOIN v ON ev.user_id = v.user_id
        |      WHERE ev.event_type = 'click' AND ev.us > v.t GROUP BY 1),
        |p AS (SELECT ev.user_id, min(ev.us) AS t FROM ev
        |      JOIN c ON ev.user_id = c.user_id
        |      WHERE ev.event_type = 'purchase' AND ev.us > c.t GROUP BY 1)
        |SELECT '1_view' AS stage, count(*) AS users FROM v
        |UNION ALL SELECT '2_click', count(*) FROM c
        |UNION ALL SELECT '3_purchase', count(*) FROM p
        |ORDER BY stage""".stripMargin,
    "f15_url" ->
      """WITH u AS (SELECT 'https://sub' || (doc_id % 5) ||
        |    '.example.com/p/' || (doc_id % 7) || '/page?q=' ||
        |    (doc_id % 11) || '&ref=r' || (doc_id % 3) AS url
        |  FROM documents),
        |p AS (SELECT
        |    regexp_extract(url, 'https?://([^/]+)', 1) AS host,
        |    regexp_extract(url, 'https?://[^/]+([^?]*)', 1) AS path,
        |    CAST(regexp_extract(url, '[?&]q=([0-9]+)', 1) AS BIGINT) AS q,
        |    regexp_extract(url, '[?&]ref=([A-Za-z0-9]+)', 1) AS ref
        |  FROM u)
        |SELECT host, count(*) AS c, count(DISTINCT path) AS paths,
        |  CAST(sum(q) AS BIGINT) AS sq, count(DISTINCT ref) AS refs
        |FROM p GROUP BY host ORDER BY host""".stripMargin,
    "a7_pivot" ->
      """SELECT user_id % 10 AS bucket,
        |  count(*) FILTER (event_type = 'click') AS click,
        |  count(*) FILTER (event_type = 'error') AS error,
        |  count(*) FILTER (event_type = 'purchase') AS purchase,
        |  count(*) FILTER (event_type = 'signup') AS signup,
        |  count(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "a8_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS c,
        |  sum(CAST(round(l_extendedprice*100) AS BIGINT)) / 100.0 AS revenue
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "a9_unpivot" ->
      """WITH w AS (
        |  SELECT l_returnflag,
        |    sum(CAST(round(l_quantity*100) AS BIGINT)) / 100.0 AS qty,
        |    sum(CAST(round(l_discount*100) AS BIGINT)) / 100.0 AS disc
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, 'qty' AS metric, qty AS val FROM w
        |UNION ALL SELECT l_returnflag, 'disc', disc FROM w
        |ORDER BY l_returnflag, metric""".stripMargin,
    "a10_stratified_sample" ->
      """SELECT event_type, count(*) AS total, true AS ok
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "f7_map_functions" ->
      """SELECT event_type, key, count(*) AS c,
        |  CAST(sum(CAST(json_extract(props, '$.' || key) AS BIGINT)) AS BIGINT) AS s,
        |  min(CAST(json_extract(props, '$.' || key) AS BIGINT)) AS mn,
        |  max(CAST(json_extract(props, '$.' || key) AS BIGINT)) AS mx
        |FROM (SELECT event_type, unnest(json_keys(props)) AS key, props
        |      FROM events)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "f8_quantiles" ->
      """SELECT l_returnflag,
        |  median(l_quantity) AS med_qty,
        |  quantile_cont(l_extendedprice, 0.25) AS p25_price,
        |  quantile_cont(l_extendedprice, 0.75) AS p75_price,
        |  quantile_disc(l_extendedprice, 0.5) AS p50_disc
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "f9_edit_distance" ->
      """SELECT p_brand, count(*) AS c,
        |  CAST(min(levenshtein(p_name, p_type)) AS BIGINT) AS dmin,
        |  CAST(max(levenshtein(p_name, p_type)) AS BIGINT) AS dmax,
        |  CAST(sum(levenshtein(p_name, p_type)) AS BIGINT) AS dsum
        |FROM part GROUP BY 1 ORDER BY 1""".stripMargin,
    "w4_frames" ->
      """WITH e AS (SELECT event_id, user_id, ts, epoch_us(ts) AS us,
        |    CAST(round(value*100) AS BIGINT) AS cents
        |  FROM events WHERE user_id < 3)
        |SELECT event_id, user_id,
        |  CAST(sum(cents) OVER w4 AS BIGINT) AS mv_sum,
        |  count(*) OVER w4 AS mv_n,
        |  CAST(sum(cents) OVER w4 AS BIGINT) / 100.0 / count(*) OVER w4 AS mv_avg,
        |  CAST(sum(cents) OVER hr AS BIGINT) AS hr_sum,
        |  count(*) OVER hr AS hr_n
        |FROM e
        |WINDOW
        |  w4 AS (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW),
        |  hr AS (PARTITION BY user_id ORDER BY us
        |         RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "w5_rank_family" ->
      """SELECT event_id, event_type,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 6) AS pr,
        |  round(cume_dist() OVER w, 6) AS cd,
        |  first_value(event_id) OVER f AS first_id,
        |  last_value(event_id) OVER f AS last_id,
        |  nth_value(event_id, 2) OVER f AS second_id
        |FROM events WHERE user_id < 2
        |WINDOW
        |  w AS (PARTITION BY event_type ORDER BY value, event_id),
        |  f AS (PARTITION BY event_type ORDER BY value, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY event_id""".stripMargin,
    "f10_regexp" ->
      """SELECT regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS noun,
        |  count(*) AS c,
        |  count(DISTINCT regexp_extract(p_name, '([a-z]+)', 1)) AS adjs,
        |  CAST(sum(length(regexp_replace(p_name, '[aeiou]', '', 'g'))) AS BIGINT) AS cons
        |FROM part GROUP BY 1 ORDER BY 1""".stripMargin,
    "f11_arrays" ->
      """SELECT p_partkey,
        |  CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n,
        |  array_to_string(list_sort(string_split(p_name, ' ')), '-') AS sorted_joined,
        |  list_sort(string_split(p_name, ' '))[1] AS head1,
        |  list_contains(string_split(p_name, ' '), 'widget') AS has_widget
        |FROM part WHERE p_partkey < 50 ORDER BY p_partkey""".stripMargin,
    "a11_stats" ->
      """WITH b AS (SELECT event_type,
        |    CAST(round(value*100) AS BIGINT) AS x, user_id AS y FROM events),
        |s AS (SELECT event_type, count(*) AS n,
        |    sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy,
        |    sum(x*x) AS sxx, sum(y*y) AS syy
        |  FROM b GROUP BY 1)
        |SELECT event_type, n,
        |  round(CAST(n*sxy - sx*sy AS DOUBLE) /
        |    (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) *
        |     sqrt(CAST(n*syy - sy*sy AS DOUBLE))), 9) AS corr_xy,
        |  round(sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) / n / 100.0, 9) AS sd_value
        |FROM s ORDER BY event_type""".stripMargin,
    // Verbatim the same SQL text the Spark side runs (EP2 parity).
    "a12_grouping_sets" -> GroupingSetsSql,
    "f12_null_functions" ->
      """WITH b AS (SELECT o_orderpriority,
        |    nullif(o_orderstatus, 'F') AS st,
        |    CASE WHEN o_totalprice > 150000 THEN o_totalprice END AS big
        |  FROM orders)
        |SELECT o_orderpriority, count(*) AS n, count(st) AS non_f,
        |  CAST(sum(CASE WHEN st IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS f_cnt,
        |  count(big) AS bigs,
        |  sum(CAST(round(coalesce(big, 0.0)*100) AS BIGINT)) / 100.0 AS big_sum
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    "f8b_approx_quantiles" ->
      """SELECT l_returnflag, count(*) AS n,
        |  quantile_cont(l_extendedprice, 0.45) AS p45,
        |  quantile_cont(l_extendedprice, 0.55) AS p55,
        |  true AS ok
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "f13b_month_arith" ->
      """SELECT event_id,
        |  CAST(CAST(ts AS DATE) + INTERVAL 1 MONTH AS TIMESTAMP) AS m1,
        |  CAST(CAST(ts AS DATE) + INTERVAL 13 MONTH AS TIMESTAMP) AS m13,
        |  ts + INTERVAL 2 MONTH AS m2_ts
        |FROM events WHERE user_id < 2 AND date_part('day', ts) <= 28
        |ORDER BY event_id""".stripMargin,
    "f13_datetime" ->
      """SELECT event_id,
        |  date_part('year', ts) AS y, date_part('month', ts) AS mo,
        |  date_part('day', ts) AS d, date_part('hour', ts) AS h,
        |  date_part('minute', ts) AS mi, date_part('second', ts) AS s,
        |  date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS days_in,
        |  ts + INTERVAL 90 MINUTE AS shifted
        |FROM events WHERE user_id < 2 ORDER BY event_id""".stripMargin)
}
