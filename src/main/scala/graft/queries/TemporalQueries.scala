package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Lake
import graft.operators.TemporalJoins

/** Gate entries for the time-series join operators (SURVEY.md §2.3 J7 —
  * undeclared in round 1 for lack of corpus affordance; the affordance is
  * events-to-events, since orders dates (1995–2001) and events ts (2024)
  * never overlap).
  */
object TemporalQueries {

  /** J7a: backward as-of join — for every purchase event, the most recent
    * click by the same user at or before it (ties on ts broken by max
    * event_id; left-outer, so click-less purchases keep nulls). One
    * shuffle on user_id; no range join anywhere in the plan.
    */
  def j7AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val events = Lake.table(spark, dir, "events")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    TemporalJoins.asofJoin(
        purchases, clicks,
        leftKey = "user_id", rightKey = "c_user",
        leftTime = "p_ts", rightTime = "click_ts",
        rightTie = "click_id", rightPayload = Seq("click_id"))
      .select(col("purchase_id"), col("user_id"), col("p_ts"),
        col("click_id"), col("click_ts"),
        (unix_micros(col("p_ts")) - unix_micros(col("click_ts")))
          .as("gap_us"))
      .orderBy(col("purchase_id"))
  }

  /** J7b: pure range join (no equi key) — ordered pairs of events from
    * DIFFERENT users within 2 seconds of each other. Candidate generation
    * is a bucketed equi-join (3 buckets per right row), never O(n²).
    */
  def j7RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val events = Lake.table(spark, dir, "events")
    val a = events.select(col("event_id").as("a_id"),
      col("user_id").as("a_user"), unix_micros(col("ts")).as("a_us"))
    val b = events.select(col("event_id").as("b_id"),
      col("user_id").as("b_user"), unix_micros(col("ts")).as("b_us"))
    TemporalJoins.proximityJoin(a, b, "a_us", "b_us", 2000000L)
      .filter(col("b_us") > col("a_us") && col("a_user") =!= col("b_user"))
      .select(col("a_id"), col("b_id"),
        (col("b_us") - col("a_us")).as("gap_us"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** J12: keyed interval-overlap join — per-(user, day) activity spans
    * [first event, last event], pairs of users whose same-day spans
    * intersect. Candidates come from hour-bucket explosion with the
    * canonical-bucket trick (each overlapping pair emitted exactly once,
    * no dedup shuffle); the oracle is the brute-force inequality join.
    */
  def j12IntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val iv = Lake.table(spark, dir, "events")
      .groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .agg(unix_micros(min(col("ts"))).as("s"), unix_micros(max(col("ts"))).as("e"))
    val a = iv.select(col("d"), col("user_id").as("u_a"),
      col("s").as("s_a"), col("e").as("e_a"))
    val b = iv.select(col("d"), col("user_id").as("u_b"),
      col("s").as("s_b"), col("e").as("e_b"))
    TemporalJoins.intervalOverlapJoin(a, b, "s_a", "e_a", "s_b", "e_b",
        chunk = 3600L * 1000000L, keyCols = Seq("d"))
      .filter(col("u_a") < col("u_b"))
      .groupBy(col("d"))
      .agg(count(lit(1)).as("pairs"), sum(col("u_a") + col("u_b")).as("cks"))
      .select(col("d").cast("timestamp").as("d"), col("pairs"), col("cks"))
      .orderBy(col("d"))
  }

  /** J7c: the SKEW-RESISTANT as-of join (time-chunked windows + carry
    * spine, bounded tasks under hot keys) on the same query and the same
    * correlated-subquery oracle as j7_asof_join — the driver-visible
    * proof that the skew path is value-identical to the plain path.
    */
  def j7cAsofChunked(spark: SparkSession, dir: String): DataFrame = {
    val events = Lake.table(spark, dir, "events")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    TemporalJoins.asofJoinChunked(
        purchases, clicks,
        leftKey = "user_id", rightKey = "c_user",
        leftTime = "p_ts", rightTime = "click_ts",
        rightTie = "click_id", rightPayload = Seq("click_id"),
        chunkSpan = 6L * 3600L * 1000000L)
      .select(col("purchase_id"), col("user_id"), col("p_ts"),
        col("click_id"), col("click_ts"),
        (unix_micros(col("p_ts")) - unix_micros(col("click_ts")))
          .as("gap_us"))
      .orderBy(col("purchase_id"))
  }

  /** J7d: FORWARD as-of join — for every click, the next purchase by the
    * same user at or after it (earliest time, min event_id tie; left
    * outer). Oracle: correlated min-subquery — the mirror of j7's.
    */
  def j7dAsofForward(spark: SparkSession, dir: String): DataFrame = {
    val events = Lake.table(spark, dir, "events")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("c_ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
    TemporalJoins.asofJoinForward(
        clicks, purchases,
        leftKey = "user_id", rightKey = "p_user",
        leftTime = "c_ts", rightTime = "p_ts",
        rightTie = "purchase_id", rightPayload = Seq("purchase_id"))
      .select(col("click_id"), col("user_id"), col("c_ts"),
        col("purchase_id"), col("p_ts"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("gap_us"))
      .orderBy(col("click_id"))
  }

  val all: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "j7_asof_join"  -> (j7AsofJoin _),
    "j7_range_join" -> (j7RangeJoin _),
    "j7c_asof_chunked" -> (j7cAsofChunked _),
    "j7d_asof_forward" -> (j7dAsofForward _),
    "j12_interval_join" -> (j12IntervalJoin _))

  private val AsofOracle: String =
    """WITH c AS (SELECT user_id, ts, event_id FROM events WHERE event_type='click'),
      |     p AS (SELECT user_id, ts, event_id FROM events WHERE event_type='purchase'),
      |     m AS (SELECT p.event_id AS purchase_id, p.user_id, p.ts AS p_ts,
      |             (SELECT max(c.ts) FROM c
      |               WHERE c.user_id = p.user_id AND c.ts <= p.ts) AS click_ts
      |           FROM p)
      |SELECT m.purchase_id, m.user_id, m.p_ts,
      |       (SELECT max(c.event_id) FROM c
      |         WHERE c.user_id = m.user_id AND c.ts = m.click_ts) AS click_id,
      |       m.click_ts,
      |       epoch_us(m.p_ts) - epoch_us(m.click_ts) AS gap_us
      |FROM m ORDER BY purchase_id""".stripMargin

  val oracle: Map[String, String] = Map(
    // Same oracle for the plain and chunked algorithms — both must equal
    // the correlated-subquery formulation.
    "j7c_asof_chunked" -> AsofOracle,
    "j7d_asof_forward" ->
      """WITH c AS (SELECT user_id, ts, event_id FROM events WHERE event_type='click'),
        |     p AS (SELECT user_id, ts, event_id FROM events WHERE event_type='purchase'),
        |     m AS (SELECT c.event_id AS click_id, c.user_id, c.ts AS c_ts,
        |             (SELECT min(p.ts) FROM p
        |               WHERE p.user_id = c.user_id AND p.ts >= c.ts) AS p_ts
        |           FROM c)
        |SELECT m.click_id, m.user_id, m.c_ts,
        |       (SELECT min(p.event_id) FROM p
        |         WHERE p.user_id = m.user_id AND p.ts = m.p_ts) AS purchase_id,
        |       m.p_ts,
        |       epoch_us(m.p_ts) - epoch_us(m.c_ts) AS gap_us
        |FROM m ORDER BY click_id""".stripMargin,
    // Independent formulation: correlated max-ts subquery + tie-break max
    // event_id — NOT the union-window algorithm the Spark side uses.
    "j7_asof_join" -> AsofOracle,
    "j7_range_join" ->
      """SELECT a.event_id AS a_id, b.event_id AS b_id,
        |       epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
        |FROM events a JOIN events b
        |  ON b.ts > a.ts AND b.ts <= a.ts + INTERVAL 2 SECOND
        |     AND a.user_id <> b.user_id
        |ORDER BY a_id, b_id""".stripMargin,
    "j12_interval_join" ->
      """WITH iv AS (SELECT user_id, CAST(ts AS DATE) AS d,
        |    min(epoch_us(ts)) AS s, max(epoch_us(ts)) AS e
        |  FROM events GROUP BY 1, 2)
        |SELECT CAST(a.d AS TIMESTAMP) AS d, count(*) AS pairs,
        |  CAST(sum(a.user_id + b.user_id) AS BIGINT) AS cks
        |FROM iv a JOIN iv b ON a.d = b.d AND a.user_id < b.user_id
        |  AND a.s <= b.e AND b.s <= a.e
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
