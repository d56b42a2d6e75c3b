package graft

import java.sql.DriverManager

import graft.store.JdbcUpsert
import graft.store.JdbcUpsert.Target

/** REAL end-to-end staged upsert against embedded Derby (on the Spark
  * classpath): exercises the default effect implementations —
  * DriverManager transactions for the action SQL and the Spark JDBC
  * writer for the staging append — that JdbcUpsertSpec only mocks.
  * Derby speaks neither `CREATE TABLE LIKE` nor `DELETE ... USING`,
  * so this goes through the dialect-explicit upsertWithActions. */
class JdbcUpsertDerbySpec extends SparkSuite {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftup;create=true"
  private val target = Target(url, "APP.TGT", user = "app", password = "")

  private def query(sql: String): Seq[(String, String, Int)] = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(sql)
      val out = Seq.newBuilder[(String, String, Int)]
      while (rs.next()) out += ((rs.getString(1), rs.getString(2), rs.getInt(3)))
      out.result()
    } finally conn.close()
  }

  test("staged upsert round-trips through a real database") {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute(
        "CREATE TABLE APP.TGT (ID VARCHAR(10), PAYLOAD VARCHAR(20), VERSION INT)")
      st.execute("INSERT INTO APP.TGT VALUES ('k1', 'old', 1), ('k2', 'keep', 1)")
    } finally conn.close()

    // batch: updates k1 (latest version wins), inserts k3 (with an
    // intra-batch duplicate the precedence dedup must resolve)
    val batch = Seq(
      ("k1", "new", 2), ("k3", "ins", 2), ("k3", "stale", 1))
      .toDF("ID", "PAYLOAD", "VERSION")

    val staging = "APP.TGT_STAGING_T1"
    JdbcUpsert.upsertWithActions(
      batch, target, keys = Seq("ID"),
      precedence = Seq($"VERSION".desc),
      pre = Seq(
        s"CREATE TABLE $staging (ID VARCHAR(10), PAYLOAD VARCHAR(20), VERSION INT)"),
      post = Seq(
        s"""DELETE FROM APP.TGT WHERE EXISTS (
              SELECT 1 FROM $staging S WHERE APP.TGT.ID = S.ID)""",
        s"INSERT INTO APP.TGT SELECT * FROM $staging",
        s"DROP TABLE $staging"),
      staging = staging)

    val rows = query("SELECT ID, PAYLOAD, VERSION FROM APP.TGT ORDER BY ID")
    assert(rows === Seq(
      ("k1", "new", 2), ("k2", "keep", 1), ("k3", "ins", 2)))

    // staging table dropped by the post-actions
    val meta = DriverManager.getConnection(url)
    try {
      val rs = meta.getMetaData.getTables(null, "APP", "TGT_STAGING_T1", null)
      assert(!rs.next(), "staging table should be dropped")
    } finally meta.close()
  }
}
