package graft.serve

import scala.io.Source
import scala.util.Using

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Named-query registry — the reference's analytics client
  * (/root/reference/scripts/main_analytics.py:26-43 registry +
  * scripts/athena_querier.py execute/poll/paginate) reduced to its
  * Spark-native core: load SQL text, run it through `spark.sql`
  * against registered views, return the typed DataFrame. The Athena
  * submit/poll/paginate machinery and string-typed result cells were
  * service artifacts, not semantics (SURVEY.md §3.3), so they
  * disappear.
  */
object QueryRegistry {

  /** The reference's three analytic queries (semantics of the .sql
    * files under /root/reference/athena_queries/, re-authored), keyed
    * like main_analytics.py:26-30. Valid Spark SQL and DuckDB SQL
    * alike.
    */
  val namedQueries: Map[String, String] = Map(
    // count_clientes.sql:1 — global cardinality
    "conteo_total_clientes" ->
      "SELECT COUNT(*) AS n FROM dim_clientes",
    // top_proveedores.sql:1-7 — suppliers per origin country
    "proveedores_por_pais" ->
      """SELECT country_of_origin AS pais_origen,
        |       COUNT(1) AS cantidad_proveedores
        |FROM dim_proveedores
        |GROUP BY country_of_origin""".stripMargin,
    // total_cost_per_customer.sql:1-12 — 2025 spend per customer, top 10
    "costo_total_por_cliente" ->
      """SELECT customer_id,
        |       SUM(total_cost) AS total_cost_usd
        |FROM fact_transacciones_energia
        |WHERE YEAR(CAST(transaction_date AS DATE)) = 2025
        |GROUP BY customer_id
        |ORDER BY total_cost_usd DESC
        |LIMIT 10""".stripMargin)

  /** Load SQL text from a .sql file (athena_querier.py:14-23), with
    * trailing semicolons stripped (Athena tolerated them; spark.sql
    * wants a single statement). */
  def loadSqlFile(path: String): String =
    Using.resource(Source.fromFile(path))(_.mkString)
      .trim.stripSuffix(";")

  def run(spark: SparkSession, name: String): DataFrame =
    spark.sql(namedQueries.getOrElse(
      name, throw new IllegalArgumentException(s"unknown query: $name")))

  /** Serve a named query through the plan-fingerprint result cache
    * (serve.ResultCache) — the Athena "reuse query results" flag for
    * the registry surface: a re-submitted query against unchanged
    * inputs re-READS its prior result (a bare parquet scan, zero
    * shuffle, zero source I/O) instead of recomputing.
    *
    * Invalidation story: none needed, by construction — the
    * fingerprint is a SHA-256 over the canonicalized analyzed plan
    * AND the input file listing (path, size, mtime per file), so a
    * changed literal, a changed view definition, or new/rewritten
    * data behind a registered view RE-KEYS automatically; the stale
    * entry is simply never read again (reclaim the directory on any
    * schedule — entries are self-contained). Ordering is not
    * preserved by the parquet round-trip: callers re-apply their
    * ORDER BY, the same contract as any result-set store. */
  def cached(spark: SparkSession, name: String,
      cacheDir: String = defaultCacheDir): DataFrame =
    ResultCache.through(spark, cacheDir, run(spark, name))

  /** True iff `cached(name)` would be served from the cache. */
  def isCached(spark: SparkSession, name: String,
      cacheDir: String = defaultCacheDir): Boolean =
    ResultCache.isCached(cacheDir, run(spark, name))

  /** Default cache location: per-user under the system tmp dir (the
    * user name IS in the path — on a multi-user host a shared fixed
    * dir would collide: permission failures on each other's entries,
    * and a pre-created dir owned by another user poisons the cache
    * location). */
  def defaultCacheDir: String =
    java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      s"graft-result-cache-${sys.props.getOrElse("user.name", "anon")}")
      .toString

  def runSqlFile(spark: SparkSession, path: String): DataFrame =
    spark.sql(loadSqlFile(path))

  /** Run every registered query, like run_analytics_queries
    * (main_analytics.py:33-43). */
  def runAll(spark: SparkSession): Map[String, DataFrame] =
    namedQueries.keys.map(n => n -> run(spark, n)).toMap
}
