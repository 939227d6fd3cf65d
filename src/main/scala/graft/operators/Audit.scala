package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint audit (the Deequ / dbt-test
  * shape; Schelter et al. 2018, "Automating Large-Scale Data Quality
  * Verification") — the gate a pipeline runs on every ingest batch
  * before letting it near training: each rule reports its violation
  * count against the full frame, so "is this batch OK" is one boolean
  * fold over the report.
  *
  * Scale design: every ROW-LOCAL rule (null / range / pattern /
  * accepted-values) is a conditional sum in ONE shared aggregation
  * pass — R rules cost one corpus scan, not R. [[Rule.Unique]] rules
  * are the exception (uniqueness is a corpus property): each costs one
  * partial-agg groupBy whose map-side combine absorbs hot keys, with
  * violations = Σ (group count − 1) — the rows that would have to drop
  * for the key to become unique. Nothing is collected; the report
  * frame is O(#rules).
  *
  * Pattern rules use an RE2-compatible regex subset (no lookahead /
  * backreferences — the `TextFunctions.redact` discipline) under
  * FULL-match semantics, so the decision is portable across regex
  * engines.
  */
object Audit {

  sealed trait Rule { def name: String }

  object Rule {
    /** Violated when the column IS NULL. */
    final case class NotNull(column: String) extends Rule {
      val name = s"not_null($column)"
    }
    /** Violated when a NON-NULL value falls outside [lo, hi] (nulls
      * are [[NotNull]]'s business, the Deequ convention). */
    final case class InRange(column: String, lo: Double, hi: Double)
        extends Rule {
      require(lo <= hi, s"InRange($column): lo $lo > hi $hi")
      val name = s"in_range($column,$lo,$hi)"
    }
    /** Violated when a NON-NULL value does not FULL-match the
      * RE2-subset pattern. */
    final case class Matches(column: String, pattern: String)
        extends Rule {
      val name = s"matches($column)"
    }
    /** Violated when a NON-NULL value is outside the accepted set. */
    final case class AcceptedValues(column: String, values: Seq[String])
        extends Rule {
      require(values.nonEmpty, s"AcceptedValues($column): empty set")
      val name = s"accepted_values($column)"
    }
    /** Violated by every row beyond the first of a duplicated key
      * (NULL is an ordinary key level, as Deequ counts it). */
    final case class Unique(columns: Seq[String]) extends Rule {
      require(columns.nonEmpty, "Unique: no columns")
      val name = s"unique(${columns.mkString(",")})"
    }
  }
  import Rule._

  private def violatedWhen(r: Rule): Column = r match {
    case NotNull(c) => col(c).isNull
    case InRange(c, lo, hi) =>
      col(c).isNotNull && !col(c).cast("double").between(lo, hi)
    case Matches(c, p) =>
      col(c).isNotNull && !col(c).rlike("^(?:" + p + ")$")
    case AcceptedValues(c, vs) =>
      col(c).isNotNull && !col(c).isin(vs: _*)
    case _: Unique =>
      throw new IllegalArgumentException("Unique is not row-local")
  }

  /** The audit report: one row per rule —
    * (rule STRING, violations BIGINT, total BIGINT, pass BOOLEAN). */
  def audit(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "audit: no rules")
    require(rules.map(_.name).distinct.size == rules.size,
      "audit: duplicate rule names — every report row must be attributable")
    val unique = rules.collect { case u: Unique => u }
    val rowLocal = rules.filterNot(_.isInstanceOf[Unique])
    val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    if (rowLocal.nonEmpty) {
      // one shared pass: a conditional sum per rule + the total, then
      // the 1-row frame unpivoted via explode so the agg plans ONCE
      // (k unioned selects off the same agg frame would replicate it)
      val aggs = rowLocal.zipWithIndex.map { case (r, i) =>
        sum(when(violatedWhen(r), 1L).otherwise(0L)).as(s"__v$i")
      } :+ count(lit(1)).as("__total")
      val stats = df.agg(aggs.head, aggs.tail: _*)
      frames += stats.select(explode(array(
        rowLocal.zipWithIndex.map { case (r, i) =>
          // coalesce: SUM over an empty frame is NULL, the report says 0
          struct(lit(r.name).as("rule"),
            coalesce(col(s"__v$i"), lit(0L)).as("violations"),
            col("__total").as("total"))
        }: _*)).as("__r"))
        .select(col("__r.rule"), col("__r.violations"), col("__r.total"))
    }
    unique.foreach { u =>
      frames += df.groupBy(u.columns.map(col): _*)
        .agg(count(lit(1)).as("__n"))
        .agg(coalesce(sum(col("__n") - 1L), lit(0L)).as("violations"),
          coalesce(sum(col("__n")), lit(0L)).as("total"))
        .select(lit(u.name).as("rule"), col("violations"), col("total"))
    }
    frames.reduce(_.unionByName(_))
      .withColumn("pass", col("violations") === 0L)
  }
}
