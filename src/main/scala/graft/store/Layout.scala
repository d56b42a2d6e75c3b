package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Physical-layout writer: hive partitioning for pruning, plus
  * sort-within-partitions on write so parquet row-group min/max
  * statistics become selective for the sort keys (a range predicate
  * on a sorted column skips most row groups; on an unsorted column it
  * skips none). The 100 TB complement to predicate pushdown: pushdown
  * decides what CAN be skipped, layout decides what IS skipped.
  *
  * `repartition(partitionCols)` before the sort keeps one writer task
  * per hive partition (no small-file explosion), at the cost of a
  * shuffle — the standard write-amplification trade.
  */
object Layout {
  def writeSorted(
      df: DataFrame, path: String,
      partitionCols: Seq[String], sortCols: Seq[String],
      mode: String = "overwrite"): Unit = {
    val arranged =
      if (partitionCols.nonEmpty)
        df.repartition(partitionCols.map(col): _*)
          .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      else df.sortWithinPartitions(sortCols.map(col): _*)
    val w = arranged.write.mode(mode)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
  }
}
