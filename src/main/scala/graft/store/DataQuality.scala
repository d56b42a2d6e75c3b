package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality audit — declarative constraints evaluated as ONE
  * aggregate per table scan, reported as (check_name, n_violations,
  * n_checked) rows. The lake-ops companion to ingestion: referential
  * integrity across the star schema, null keys, duplicate primary
  * keys, domain ranges.
  *
  * Scale shape: predicate checks are partial-aggregable counters
  * riding a single scan (zero extra shuffles); a foreign-key check is
  * one left-anti join shuffling on the key (broadcast when the parent
  * is a dimension); uniqueness is count(*) − count(distinct key) —
  * one exchange. Nothing is ever row-materialized: violations are
  * COUNTED in the engine, and a debugging query can re-run the same
  * predicate to fetch offenders.
  */
object DataQuality {

  /** Count rows of `df` violating `violated` (a predicate that is
    * true ON VIOLATION). */
  def predicateCheck(name: String, df: DataFrame, violated: Column):
      DataFrame =
    df.agg(count(when(violated, 1)).as("n_violations"),
        count(lit(1)).as("n_checked"))
      .select(lit(name).as("check_name"), col("n_violations"),
        col("n_checked"))

  /** Child rows whose `fk` has no parent `pk` (left anti join).
    * The parent key is aliased before the join: with a shared column
    * name (both sides "custkey", the common case) col(fk) === col(pk)
    * is ambiguous after the join and fails analysis. */
  def foreignKeyCheck(name: String, child: DataFrame, fk: String,
      parent: DataFrame, pk: String): DataFrame = {
    val orphans = child.select(col(fk))
      .join(parent.select(col(pk).as("__parent_pk")),
        col(fk) === col("__parent_pk"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    val total = child.agg(count(lit(1)).as("n_checked"))
    orphans.crossJoin(total)
      .select(lit(name).as("check_name"), col("n_violations"),
        col("n_checked"))
  }

  /** Excess rows beyond one per key (0 ⇔ key is unique). */
  def uniqueCheck(name: String, df: DataFrame, key: String): DataFrame =
    df.agg((count(lit(1)) - countDistinct(col(key))).as("n_violations"),
        count(lit(1)).as("n_checked"))
      .select(lit(name).as("check_name"), col("n_violations"),
        col("n_checked"))

  /** Union of check results, one row per check. */
  def audit(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_ unionByName _)
}
