package graft.store

import org.apache.spark.sql.{Column, DataFrame}

/** Staged keyed upsert over JDBC — the reference's Redshift sink
  * (/root/reference/glue_jobs/etl-s3-processed-to-redshift.py:54-96)
  * as a thin adapter over `df.write.format("jdbc")`: dedup the batch,
  * create a staging table (pre-actions), bulk-append the batch into
  * staging, then DELETE-matched + INSERT-all + DROP staging
  * (post-actions) in one transaction on the target database.
  *
  * The SQL rendering and option plumbing are pure functions so they
  * unit-test without a database (none exists in this sandbox); the
  * two effectful steps — running action SQL and writing the batch —
  * are injectable for the same reason. Production callers use the
  * defaults, which go through DriverManager and the Spark JDBC
  * writer.
  *
  * Scale notes: the JDBC write parallelism is the DataFrame's
  * partition count (one connection per partition — repartition the
  * batch to the database's sweet spot, usually 8-32); the
  * DELETE+INSERT post-action runs entirely inside the warehouse,
  * sized by the staging table, not the target.
  */
object JdbcUpsert {

  /** Connection target. `options` passes through any extra Spark JDBC
    * options (driver, batchsize, isolationLevel, ...). */
  final case class Target(
      url: String,
      table: String,
      user: String,
      password: String,
      options: Map[String, String] = Map.empty)

  /** Staging table name alongside the target (schema-qualified like
    * the reference's `{schema}.{base}_staging_{uuid8}`). */
  def stagingName(table: String, suffix: String): String =
    table.split('.') match {
      case Array(schema, base) => s"$schema.${base}_staging_$suffix"
      case _ => s"${table}_staging_$suffix"
    }

  /** Pre-actions: fresh empty staging table shaped like the target. */
  def preActions(table: String, staging: String): Seq[String] = Seq(
    s"DROP TABLE IF EXISTS $staging",
    s"CREATE TABLE $staging (LIKE $table)")

  /** Post-actions: keyed delete of matched target rows, insert the
    * full staging content, drop staging — the reference's upsert
    * semantics verbatim (delete-matched + insert-all, NOT update). */
  def postActions(table: String, staging: String,
      keys: Seq[String]): Seq[String] = {
    require(keys.nonEmpty, "jdbc upsert requires at least one key column")
    val keysMatch = keys.map(k => s"$table.$k = $staging.$k").mkString(" AND ")
    Seq(
      s"DELETE FROM $table USING $staging WHERE $keysMatch",
      s"INSERT INTO $table SELECT * FROM $staging",
      s"DROP TABLE $staging")
  }

  /** Spark JDBC writer options for the staging append. */
  def writerOptions(t: Target, staging: String): Map[String, String] =
    t.options ++ Map(
      "url" -> t.url,
      "dbtable" -> staging,
      "user" -> t.user,
      "password" -> t.password)

  /** Default action runner: one JDBC connection, statements in order,
    * single transaction (all-or-nothing like the reference's Glue
    * postactions). */
  def runViaDriverManager(t: Target)(statements: Seq[String]): Unit = {
    val conn = java.sql.DriverManager.getConnection(t.url, t.user, t.password)
    try {
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      try { statements.foreach(st.execute); conn.commit() }
      catch { case e: Throwable => conn.rollback(); throw e }
      finally st.close()
    } finally conn.close()
  }

  /** Default batch writer: Spark JDBC append into the staging table. */
  def writeViaSparkJdbc(batch: DataFrame, opts: Map[String, String]): Unit =
    batch.write.format("jdbc").options(opts).mode("append").save()

  /** The staged upsert. `suffix` defaults to a random 8-hex id like
    * the reference; pass a fixed one for reproducible tests. */
  def upsert(
      batch: DataFrame,
      target: Target,
      keys: Seq[String],
      precedence: Seq[Column] = Nil,
      suffix: String = java.util.UUID.randomUUID().toString.take(8),
      runSql: Target => Seq[String] => Unit = runViaDriverManager,
      writeBatch: (DataFrame, Map[String, String]) => Unit = writeViaSparkJdbc)
      : Unit = {
    val staging = stagingName(target.table, suffix)
    upsertWithActions(batch, target, keys, precedence,
      preActions(target.table, staging),
      postActions(target.table, staging, keys),
      staging, runSql, writeBatch)
  }

  /** Dialect-explicit variant: callers supply the pre/post DDL/DML
    * when the warehouse doesn't speak the Redshift spellings
    * (`CREATE TABLE LIKE`, `DELETE ... USING`) — e.g. Derby or
    * Postgres-without-USING. Orchestration, dedup, staging write, and
    * transactionality are identical. */
  def upsertWithActions(
      batch: DataFrame,
      target: Target,
      keys: Seq[String],
      precedence: Seq[Column],
      pre: Seq[String],
      post: Seq[String],
      staging: String,
      runSql: Target => Seq[String] => Unit = runViaDriverManager,
      writeBatch: (DataFrame, Map[String, String]) => Unit = writeViaSparkJdbc)
      : Unit = {
    require(keys.nonEmpty, "jdbc upsert requires at least one key column")
    val deduped = Merge.dedupKeyed(batch, keys, precedence)
    runSql(target)(pre)
    writeBatch(deduped, writerOptions(target, staging))
    runSql(target)(post)
  }
}
