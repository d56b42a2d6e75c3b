package graft.store

import org.apache.spark.sql.SparkSession

/** Catalog persistence for a parquet zone — the reference's Glue
  * Crawler + Data Catalog (/root/reference/README.md:28): the crawler
  * derives table metadata from the S3 layout and registers it in a
  * catalog shared by every query engine. Here the zone directory IS
  * the layout; `crawl` registers each table subdirectory as an
  * EXTERNAL parquet table in Spark's session catalog (not a temp
  * view), so the definitions live in the shared ExternalCatalog:
  * visible to every `SparkSession.newSession()` on the context, and —
  * when the session is backed by a persistent metastore
  * (`spark.sql.catalogImplementation=hive`, or Glue/Unity in a real
  * deployment) — to every future application as well. The in-memory
  * catalog (this sandbox's only option: catalogImplementation is a
  * static conf pinned by the shared test context) keeps the same API
  * surface; re-crawling after a restart is cheap and deterministic
  * because the layout is the source of truth, exactly the crawler
  * model.
  */
object CatalogZone {

  /** Subdirectories of the zone = table names, the crawler convention. */
  def discover(zoneDir: String): Seq[String] = {
    val d = new java.io.File(zoneDir)
    if (!d.isDirectory) Seq.empty
    else d.listFiles().filter(_.isDirectory).map(_.getName)
      .filterNot(_.startsWith(".")).toSeq.sorted
  }

  /** Register every discovered table as an external parquet table.
    * Existing definitions are replaced (drop + recreate) so a
    * re-crawl picks up schema evolution, like a crawler re-run.
    * Returns the registered names. */
  def crawl(spark: SparkSession, zoneDir: String,
      database: String = "default"): Seq[String] = {
    val tables = discover(zoneDir)
    tables.foreach { t =>
      val fq = s"$database.$t"
      if (spark.catalog.tableExists(fq)) spark.sql(s"DROP TABLE $fq")
      spark.catalog.createTable(fq, "parquet",
        Map("path" -> s"$zoneDir/$t"))
      // drop any stale shared file-listing cache for the path, so a
      // re-crawl sees files added since the previous registration
      spark.catalog.refreshByPath(s"$zoneDir/$t")
    }
    tables
  }
}
