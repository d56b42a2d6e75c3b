package graft

import graft.store.DataQuality._

/** DataQuality contract: each check counts exactly the injected
  * violations (the star-schema audit q111 runs finds zero on the
  * clean synthetic data, so the counting logic is pinned here on
  * frames WITH defects). */
class DataQualitySpec extends SparkSuite {

  test("checks count injected violations exactly") {
    import spark.implicits._
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    // two orphans (fk=99 twice), one null key, one dup pair on id
    val child = Seq(
      (Some(1L), 10L, 5.0), (Some(99L), 11L, -1.0), (Some(99L), 12L, 2.0),
      (None: Option[Long], 13L, 0.5), (Some(2L), 10L, 1.5))
      .toDF("fk", "id", "v")

    val fk = foreignKeyCheck("fk", child, "fk", parent, "pk")
      .collect()(0)
    // NULL fk never matches → counted as orphan by the anti join,
    // plus the two fk=99 rows
    assert(fk.getLong(1) == 3 && fk.getLong(2) == 5)

    val nn = predicateCheck("nn", child, $"fk".isNull).collect()(0)
    assert(nn.getLong(1) == 1 && nn.getLong(2) == 5)

    val uq = uniqueCheck("uq", child, "id").collect()(0)
    assert(uq.getLong(1) == 1 && uq.getLong(2) == 5) // one excess row on id=10

    val rg = predicateCheck("rg", child, $"v" < 0.0).collect()(0)
    assert(rg.getLong(1) == 1 && rg.getLong(2) == 5)

    // same column name on both sides — the common star-schema shape;
    // must not hit ambiguous-reference analysis failure
    val sameName = foreignKeyCheck("sn",
      child.withColumnRenamed("fk", "custkey"), "custkey",
      parent.withColumnRenamed("pk", "custkey"), "custkey")
      .collect()(0)
    assert(sameName.getLong(1) == 3 && sameName.getLong(2) == 5)

    val all = audit(Seq(
      foreignKeyCheck("fk", child, "fk", parent, "pk"),
      predicateCheck("nn", child, $"fk".isNull)))
      .orderBy("check_name").collect()
    assert(all.map(_.getString(0)).toSeq == Seq("fk", "nn"))
  }
}
