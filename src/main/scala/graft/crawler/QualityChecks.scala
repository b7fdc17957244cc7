package graft.crawler

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation over lake tables (crawler surface
  * widening, SURVEY §2.8): the standard constraint families a catalog
  * publishes next to a profile — not-null, accepted values, numeric
  * range, arbitrary row predicate, key uniqueness, and cross-table
  * referential integrity.
  *
  * Scale notes: ALL single-table rules compile into ONE aggregation over
  * ONE scan — a conditional `sum` per rule plus one `count_distinct` per
  * uniqueness rule — so N rules cost the same scan as one. The result is
  * reshaped row-per-rule with `stack` (a 1-row local transpose, no
  * shuffle). Referential integrity is a left-anti join on the key: one
  * hash shuffle, broadcastable when the parent is a dim.
  */
object QualityChecks {

  /** A named constraint over a single table. */
  sealed trait Rule { def name: String }

  /** Column must be non-null. */
  final case class NotNull(name: String, column: String) extends Rule

  /** Non-null values must be one of `values` (nulls are NotNull's job). */
  final case class AcceptedValues(name: String, column: String, values: Seq[String]) extends Rule

  /** Non-null values must lie in [lo, hi]. */
  final case class InRange(name: String, column: String, lo: Double, hi: Double) extends Rule

  /** Row must satisfy an arbitrary boolean expression (null counts as a
    * violation — a predicate that cannot be shown true is not a pass).
    */
  final case class Predicate(name: String, expr: Column) extends Rule

  /** Column values must be unique across the table (exact count-distinct
    * vs row count; nulls count as rows but not as distinct values, so a
    * null-bearing key column fails unless also covered by NotNull).
    */
  final case class Unique(name: String, column: String) extends Rule

  private def violationExpr(r: Rule): Column = r match {
    case NotNull(_, c)           => col(c).isNull
    case AcceptedValues(_, c, v) => col(c).isNotNull && !col(c).isin(v: _*)
    case InRange(_, c, lo, hi)   => col(c).isNotNull && (col(c) < lo || col(c) > hi)
    case Predicate(_, e)         => !coalesce(e, lit(false))
    case Unique(_, _) =>
      throw new IllegalStateException("Unique handled via count_distinct")
  }

  /** Evaluate `rules` against `table` in a single aggregation pass.
    * Output: one row per rule — (check, violations, total, ok) — in the
    * given rule order is NOT guaranteed; callers order by `check`.
    */
  def validate(table: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    require(rules.map(_.name).distinct.size == rules.size, "rule names must be unique")
    // names are spliced into a stack() SQL string and used as column
    // identifiers below — restrict to identifier-safe characters
    require(rules.forall(_.name.matches("[A-Za-z0-9_]+")),
      "rule names must match [A-Za-z0-9_]+")
    val aggs: Seq[Column] = count(lit(1)).as("_total") +: rules.map {
      case Unique(n, c) =>
        // count over ALL rows minus distinct non-null values: nulls are
        // rows that contribute no distinct value, so any null makes the
        // rule fail — exactly the documented key-column contract.
        (count(lit(1)) - count_distinct(col(c))).as(s"_v_$n")
      case r =>
        sum(when(violationExpr(r), 1L).otherwise(0L)).as(s"_v_${r.name}")
    }
    val wide = table.agg(aggs.head, aggs.tail: _*)
    // 1-row wide → row-per-rule long form; stack is evaluated locally.
    val stackArgs = rules
      .map(r => s"'${r.name}', _v_${r.name}")
      .mkString(", ")
    wide
      .select(expr(s"stack(${rules.size}, $stackArgs) AS (check, violations)"),
        col("_total").as("total"))
      .select(col("check"),
        coalesce(col("violations"), lit(0L)).as("violations"),
        col("total"),
        (coalesce(col("violations"), lit(0L)) === 0L).as("ok"))
  }

  /** Referential integrity: every non-null `childKey` must exist in
    * `parentKey`. Returns the same (check, violations, total, ok) shape;
    * `violations` counts orphan child rows. One anti-join shuffle (or a
    * broadcast when the parent is small — caller may pass
    * `broadcast(parent)`).
    */
  def referential(
      checkName: String,
      child: DataFrame,
      childKey: String,
      parent: DataFrame,
      parentKey: String): DataFrame = {
    val orphans = child
      .filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as("__pk")).distinct(),
        col(childKey) === col("__pk"), "left_anti")
      .agg(count(lit(1)).as("violations"))
    val total = child.agg(count(lit(1)).as("total"))
    orphans
      .crossJoin(total) // both sides are 1 aggregated row
      .select(lit(checkName).as("check"), col("violations"), col("total"),
        (col("violations") === 0L).as("ok"))
  }
}
