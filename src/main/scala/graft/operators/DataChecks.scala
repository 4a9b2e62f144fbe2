package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the dbt-test / Deequ-style
  * validation suite a pipeline runs before promoting a drop: each rule
  * reduces to a violation COUNT, so the whole suite is a handful of
  * aggregations the planner fuses over one scan per table (plus one
  * anti-join per referential rule), never a row-by-row validator.
  */
object DataChecks {

  sealed trait Rule { def name: String }

  /** No duplicate values of `keys` (composite allowed). */
  final case class Unique(name: String, df: DataFrame, keys: Seq[String]) extends Rule
  /** Predicate must hold on every row. */
  final case class Holds(name: String, df: DataFrame, predicate: Column) extends Rule
  /** Every non-null `fk` must exist in `ref`'s `pk` (orphan check). */
  final case class RefersTo(name: String, df: DataFrame, fk: String,
      ref: DataFrame, pk: String) extends Rule

  /** One row per rule: (rule, n_violations) — 0 means the rule passes.
    * Violations, not booleans, so a failing drop is immediately sized.
    */
  def run(rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules given")
    rules.map {
      case Unique(name, df, keys) =>
        df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
          .filter(col("n") > 1)
          .agg(coalesce(sum(col("n")), lit(0L)).cast("long").as("n_violations"))
          .select(lit(name).as("rule"), col("n_violations"))
      case Holds(name, df, predicate) =>
        df.agg(sum(when(!coalesce(predicate, lit(false)), 1L).otherwise(0L))
          .cast("long").as("n_violations"))
          .select(lit(name).as("rule"), col("n_violations"))
      case RefersTo(name, df, fk, ref, pk) =>
        df.filter(col(fk).isNotNull)
          .join(ref.select(col(pk).as(fk)).distinct(), Seq(fk), "left_anti")
          .agg(count(lit(1)).cast("long").as("n_violations"))
          .select(lit(name).as("rule"), col("n_violations"))
    }.reduce(_ unionByName _)
  }
}
