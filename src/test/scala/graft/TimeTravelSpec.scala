package graft

import org.apache.spark.sql.functions._

import graft.store.TimeTravel

class TimeTravelSpec extends SparkSuite {
  import spark.implicits._

  private def snap(rows: Seq[(Long, String)]) =
    rows.toDF("id", "v")

  test("as-of resolves to the largest committed version <= requested") {
    val dir = tmpDir("tt_asof_").toString
    TimeTravel.writeSnapshot(snap(Seq(1L -> "a")), dir, 1L)
    TimeTravel.writeSnapshot(snap(Seq(1L -> "b", 2L -> "b")), dir, 3L)
    TimeTravel.writeSnapshot(snap(Seq(1L -> "c")), dir, 7L)
    assert(TimeTravel.listVersions(spark, dir) == Seq(1L, 3L, 7L))
    // exact hit, gap hit (5 -> 3), below-first throws
    assert(TimeTravel.readAsOf(spark, dir, 3L).count() == 2)
    assert(TimeTravel.readAsOf(spark, dir, 5L).count() == 2)
    assert(TimeTravel.readAsOf(spark, dir, 100L)
      .select($"v").distinct().as[String].collect().toSeq == Seq("c"))
    intercept[IllegalArgumentException](TimeTravel.readAsOf(spark, dir, 0L))
  }

  test("historical read is pinned: committing v3 does not change v2") {
    val dir = tmpDir("tt_pin_").toString
    TimeTravel.writeSnapshot(snap(Seq(1L -> "x", 2L -> "x")), dir, 1L)
    TimeTravel.writeSnapshot(snap(Seq(1L -> "y", 2L -> "y", 3L -> "y")),
      dir, 2L)
    val before = TimeTravel.readAsOf(spark, dir, 2L)
      .orderBy($"id").as[(Long, String)].collect().toSeq
    TimeTravel.writeSnapshot(snap(Seq(9L -> "z")), dir, 3L)
    val after = TimeTravel.readAsOf(spark, dir, 2L)
      .orderBy($"id").as[(Long, String)].collect().toSeq
    assert(before == after)
    assert(after == Seq((1L, "y"), (2L, "y"), (3L, "y")))
  }

  test("snapshots are immutable: rewriting a committed version throws") {
    val dir = tmpDir("tt_immut_").toString
    TimeTravel.writeSnapshot(snap(Seq(1L -> "a")), dir, 1L)
    intercept[IllegalArgumentException](
      TimeTravel.writeSnapshot(snap(Seq(1L -> "b")), dir, 1L))
    assert(TimeTravel.readLatest(spark, dir)
      .as[(Long, String)].collect().toSeq == Seq((1L, "a")))
  }

  test("retention drops old versions but never the latest") {
    val dir = tmpDir("tt_retain_").toString
    Seq(1L, 2L, 3L).foreach(v =>
      TimeTravel.writeSnapshot(snap(Seq(v -> s"v$v")), dir, v))
    assert(TimeTravel.dropBefore(spark, dir, 3L) == Seq(1L, 2L))
    assert(TimeTravel.listVersions(spark, dir) == Seq(3L))
    // even an over-eager min keeps the table readable
    assert(TimeTravel.dropBefore(spark, dir, 100L).isEmpty)
    assert(TimeTravel.readLatest(spark, dir).count() == 1)
  }

  test("uncommitted directories (no _SUCCESS) are invisible") {
    val dir = tmpDir("tt_commit_").toString
    TimeTravel.writeSnapshot(snap(Seq(1L -> "a")), dir, 1L)
    // simulate a crashed writer: directory exists, no _SUCCESS marker
    val torn = new java.io.File(s"$dir/v=2")
    assert(torn.mkdirs())
    assert(TimeTravel.listVersions(spark, dir) == Seq(1L))
    assert(TimeTravel.readAsOf(spark, dir, 2L)
      .as[(Long, String)].collect().toSeq == Seq((1L, "a")))
  }
}
