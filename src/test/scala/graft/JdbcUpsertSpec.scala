package graft

import scala.collection.mutable

import org.apache.spark.sql.DataFrame

import graft.store.JdbcUpsert
import graft.store.JdbcUpsert.Target

/** JDBC staged-upsert adapter: SQL rendering, option plumbing, and
  * orchestration order (pre-actions → staging write → post-actions),
  * exercised with injected effects — no database exists in this
  * sandbox, and the adapter is built so everything except the raw
  * JDBC calls is testable without one. */
class JdbcUpsertSpec extends SparkSuite {
  import spark.implicits._

  private val target = Target(
    url = "jdbc:postgresql://warehouse:5439/analytics",
    table = "public.dim_clientes",
    user = "etl",
    password = "secret",
    options = Map("driver" -> "org.postgresql.Driver", "batchsize" -> "5000"))

  test("staging name is schema-qualified with the suffix") {
    assert(JdbcUpsert.stagingName("public.dim_clientes", "abc123") ===
      "public.dim_clientes_staging_abc123")
    assert(JdbcUpsert.stagingName("bare_table", "abc123") ===
      "bare_table_staging_abc123")
  }

  test("pre/post action SQL matches the staged-upsert contract") {
    val staging = JdbcUpsert.stagingName(target.table, "fixed001")
    assert(JdbcUpsert.preActions(target.table, staging) === Seq(
      s"DROP TABLE IF EXISTS $staging",
      s"CREATE TABLE $staging (LIKE public.dim_clientes)"))
    val post = JdbcUpsert.postActions(target.table, staging, Seq("id", "src"))
    assert(post.head ===
      s"DELETE FROM public.dim_clientes USING $staging " +
        s"WHERE public.dim_clientes.id = $staging.id " +
        s"AND public.dim_clientes.src = $staging.src")
    assert(post(1) === s"INSERT INTO public.dim_clientes SELECT * FROM $staging")
    assert(post(2) === s"DROP TABLE $staging")
    assertThrows[IllegalArgumentException](
      JdbcUpsert.postActions(target.table, staging, Nil))
  }

  test("writer options carry url/dbtable/credentials plus extras") {
    val opts = JdbcUpsert.writerOptions(target, "public.s_1")
    assert(opts("url") === target.url)
    assert(opts("dbtable") === "public.s_1")
    assert(opts("user") === "etl" && opts("password") === "secret")
    assert(opts("driver") === "org.postgresql.Driver")
    assert(opts("batchsize") === "5000")
  }

  test("upsert orchestrates pre → dedup'd staging write → post") {
    val calls = mutable.Buffer[String]()
    var written: Option[(DataFrame, Map[String, String])] = None
    val batch = Seq(("k1", "a", 2), ("k1", "old", 1), ("k2", "b", 1))
      .toDF("id", "payload", "version")

    JdbcUpsert.upsert(
      batch, target, keys = Seq("id"),
      precedence = Seq($"version".desc),
      suffix = "fixed001",
      runSql = _ => stmts => calls ++= stmts,
      writeBatch = (df, opts) => { calls += "WRITE"; written = Some((df, opts)) })

    val staging = "public.dim_clientes_staging_fixed001"
    assert(calls.toSeq === Seq(
      s"DROP TABLE IF EXISTS $staging",
      s"CREATE TABLE $staging (LIKE public.dim_clientes)",
      "WRITE",
      s"DELETE FROM public.dim_clientes USING $staging " +
        s"WHERE public.dim_clientes.id = $staging.id",
      s"INSERT INTO public.dim_clientes SELECT * FROM $staging",
      s"DROP TABLE $staging"))

    val (df, opts) = written.get
    assert(opts("dbtable") === staging)
    val rows = df.as[(String, String, Int)].collect().toMap2
    assert(rows === Map("k1" -> ("a", 2), "k2" -> ("b", 1)),
      "batch deduped on keys with precedence before staging write")
  }

  private implicit class Tuples3(rows: Array[(String, String, Int)]) {
    def toMap2: Map[String, (String, Int)] =
      rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }
}
