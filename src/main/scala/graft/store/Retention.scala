package graft.store

import org.apache.spark.sql.SparkSession

/** Partition retention — the other standing maintenance job of a
  * hive-partitioned lake: expire partitions whose partition-column
  * value falls strictly below a cutoff, by deleting their DIRECTORIES.
  * Deleting at the partition-directory level is O(expired partitions)
  * metadata operations — no scan, no rewrite, no row-level delete —
  * which is the only retention rendering that stays cheap at 100 TB
  * (a filter-and-rewrite "delete" rescans the table).
  *
  * Only values lexicographically below the cutoff are removed, so the
  * partition column must be encoded order-consistently (ISO dates,
  * zero-padded numbers — exactly what the ingest layer's
  * `fecha_carga=YYYY-MM-DD` layout produces). Returns the expired
  * partition values.
  */
object Retention {

  def expire(spark: SparkSession, path: String, partitionCol: String,
      keepFrom: String): Seq[String] = {
    import org.apache.hadoop.fs.Path
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prefix = s"$partitionCol="
    val expired = fs.listStatus(p)
      .filter(e => e.isDirectory && e.getPath.getName.startsWith(prefix))
      .map(e => e.getPath.getName.stripPrefix(prefix))
      .filter(_ < keepFrom)
      .sorted
    expired.foreach { v =>
      fs.delete(new Path(p, s"$prefix$v"), true)
    }
    expired.toSeq
  }
}
