package graft

import org.apache.spark.sql.functions._

import graft.operators.SnapshotDiff

/** SnapshotDiff contract: the change log is exactly the edit script
  * between the snapshots — applying it to the old snapshot reproduces
  * the new one, and unchanged keys never appear in it. */
class SnapshotDiffSpec extends SparkSuite {

  private def snaps() = {
    import spark.implicits._
    val ords = Tables.table(spark, sf0001, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    val oldSnap = ords.filter($"o_orderkey" % 13 =!= 0)
    val newSnap = ords.filter($"o_orderkey" % 10 =!= 0)
      .withColumn("o_totalprice",
        when($"o_orderkey" % 7 === 0, $"o_totalprice" + lit(10.0))
          .otherwise($"o_totalprice"))
    (oldSnap, newSnap)
  }

  test("apply(old, diff) == new") {
    import spark.implicits._
    val (oldSnap, newSnap) = snaps()
    val d = SnapshotDiff.diff(oldSnap, newSnap, Seq("o_orderkey"),
      Seq("o_orderstatus", "o_totalprice")).localCheckpoint()
    // delete + update keys leave the old side; insert + update rows
    // enter with their new-side values
    val removedKeys = d
      .filter($"change_type".isin("delete", "update"))
      .select($"o_orderkey")
    val incoming = d
      .filter($"change_type".isin("insert", "update"))
      .select($"o_orderkey",
        $"new_o_orderstatus".as("o_orderstatus"),
        $"new_o_totalprice".as("o_totalprice"))
    val applied = oldSnap
      .join(removedKeys, Seq("o_orderkey"), "left_anti")
      .unionByName(incoming)
      .orderBy($"o_orderkey").collect().toSeq
    val want = newSnap.orderBy($"o_orderkey").collect().toSeq
    assert(applied.nonEmpty)
    assert(applied == want)
  }

  test("diff contains no unchanged keys and all three change types") {
    import spark.implicits._
    val (oldSnap, newSnap) = snaps()
    val d = SnapshotDiff.diff(oldSnap, newSnap, Seq("o_orderkey"),
      Seq("o_orderstatus", "o_totalprice")).localCheckpoint()
    val types = d.select($"change_type").distinct()
      .collect().map(_.getString(0)).toSet
    assert(types == Set("insert", "delete", "update"))
    // a key in both snapshots with equal compare columns never shows
    // up (rename before the join: both frames share lineage, and
    // df("col") disambiguation is unreliable on self-joins)
    val o = oldSnap.toDF("k", "os_o", "tp_o")
    val n = newSnap.toDF("k", "os_n", "tp_n")
    val unchanged = o.join(n, "k")
      .filter($"os_o" <=> $"os_n" && $"tp_o" <=> $"tp_n")
      .select($"k".as("o_orderkey"))
    assert(d.join(unchanged, Seq("o_orderkey"), "left_semi").isEmpty)
  }
}
