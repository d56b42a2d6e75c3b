package graft

import graft.model.Model.TableKind
import graft.store.Layout

class LayoutSpec extends SparkSuite {
  import spark.implicits._

  test("writeSorted: partitioned layout round-trips and prunes") {
    val dir = tmpDir("layout").resolve("t").toString
    val df = Tables.table(spark, sf0001, "orders")
      .selectExpr("o_orderkey", "o_custkey", "o_totalprice",
        "cast(o_orderdate as date) AS order_date",
        "year(o_orderdate) AS order_year")
    Layout.writeSorted(df, dir,
      partitionCols = Seq("order_year"), sortCols = Seq("o_orderkey"))
    val back = spark.read.parquet(dir)
    assert(back.count() === df.count())
    // partition pruning surface
    val y96 = back.filter($"order_year" === 1996)
    assert(y96.count() === df.filter($"order_year" === 1996).count())
    // within each file, the sort key is non-decreasing
    import org.apache.spark.sql.functions._
    val violations = back
      .withColumn("f", input_file_name())
      .withColumn("prev", lag($"o_orderkey", 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"f").orderBy(monotonically_increasing_id())))
      .filter($"prev".isNotNull && $"prev" > $"o_orderkey")
      .count()
    assert(violations === 0, "rows sorted within files")
  }

  test("zValue matches the bit-interleave model on random pairs") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(200)((rnd.nextInt(1 << 10).toLong,
      rnd.nextInt(1 << 10).toLong))
    def model(a: Long, b: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (z, i) =>
        z | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }
    val got = pairs.toDF("a", "b")
      .select($"a", $"b", Layout.zValue($"a", $"b", 10).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) => assert(z === model(a, b, 10), s"($a,$b)") }
  }

  test("aligned square boxes are CONTIGUOUS z-intervals (the pruning guarantee)") {
    // for a 2^k-aligned 2^k × 2^k box, the z-curve visits exactly the
    // range [z(x0,y0), z(x0,y0) + 4^k) — so a range-partitioned file
    // layout puts the whole box in adjacent files
    def model(a: Long, b: Long): Long =
      (0 until 10).foldLeft(0L) { (z, i) =>
        z | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }
    for (k <- Seq(2, 4, 6); x0 <- Seq(0L, 64L, 192L); y0 <- Seq(0L, 128L)) {
      val side = 1L << k
      val zs = for (x <- x0 until x0 + side; y <- y0 until y0 + side)
        yield model(x, y)
      assert(zs.min === model(x0, y0))
      assert(zs.max - zs.min + 1 === side * side, s"k=$k box not contiguous")
      assert(zs.toSet.size === (side * side).toInt)
    }
  }

  test("writeZOrdered: a 2-D box query touches few of the range-partitioned files") {
    import org.apache.spark.sql.functions._
    val dir = tmpDir("zorder").resolve("orders_z").toString
    val o = Tables.table(spark, sf0001, "orders")
      .withColumn("x", ($"o_custkey" % 1024).cast("long"))
      .withColumn("y", (datediff($"o_orderdate".cast("date"),
        lit("1970-01-01").cast("date")) % 1024).cast("long"))
    Layout.writeZOrdered(o, dir, "x", "y", bits = 10, numFiles = 16)
    val back = spark.read.parquet(dir)
    val nFiles = back.select(input_file_name()).distinct().count()
    assert(nFiles >= 8, s"want a multi-file layout, got $nFiles")
    // 64-aligned 64×64 box → one contiguous z-interval → adjacent files
    val box = back.filter($"x" >= 0 && $"x" < 64 && $"y" >= 64 && $"y" < 128)
    val matched = box.count()
    assert(matched > 0, "fixture box must match rows")
    val touched = box.select(input_file_name()).distinct().count()
    assert(touched <= 4,
      s"box rows spread over $touched of $nFiles files — no z-locality")
  }

  test("bloomCols writes real parquet bloom filters (footer metadata present)") {
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val dir = tmpDir("bloom").resolve("t").toString
    val df = Tables.table(spark, sf0001, "orders")
      .selectExpr("o_orderkey", "o_custkey", "o_totalprice")
    Layout.writeSorted(df, dir, partitionCols = Nil,
      sortCols = Seq("o_totalprice"), bloomCols = Seq("o_orderkey"))
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val file = fs.listStatus(new Path(dir))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(file, new Configuration()))
    try {
      val cols = reader.getFooter.getBlocks.asScala.head.getColumns.asScala
      val keyCol = cols.find(_.getPath.toDotString == "o_orderkey").get
      val priceCol = cols.find(_.getPath.toDotString == "o_totalprice").get
      assert(keyCol.getBloomFilterOffset > 0,
        "o_orderkey must carry a bloom filter")
      assert(priceCol.getBloomFilterOffset <= 0,
        "unlisted columns must not pay for one")
      // and the filter is usable: a present key hits, absent may not
      val bloom = reader.getBloomFilterDataReader(
        reader.getFooter.getBlocks.asScala.head).readBloomFilter(keyCol)
      assert(bloom != null)
      val someKey = df.selectExpr("min(o_orderkey)").as[Long](
        org.apache.spark.sql.Encoders.scalaLong).head()
      assert(bloom.findHash(bloom.hash(someKey)), "present key must hit")
    } finally reader.close()
  }

  test("compact bin-packs a many-small-files table without changing its rows") {
    import org.apache.spark.sql.functions._
    val dir = tmpDir("compact").resolve("t").toString
    val o = Tables.table(spark, sf0001, "orders")
    o.repartition(40).write.parquet(dir)
    def fileCount = spark.read.parquet(dir)
      .select(input_file_name()).distinct().count()
    assert(fileCount === 40L)
    val before = o.select($"o_orderkey").as[Long].collect().sorted.toSeq
    // target ≈ a fifth of the table per file → expect ~5 files
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val total = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
    val n = Layout.compact(spark, dir, total / 5)
    assert(n < 40 && n >= 1)
    assert(fileCount === n.toLong, "directory holds exactly n files")
    val after = spark.read.parquet(dir)
      .select($"o_orderkey").as[Long].collect().sorted.toSeq
    assert(after === before, "compaction must not change the rows")
  }

  test("compact rejects hive-partitioned directories (would flatten the layout)") {
    val dir = tmpDir("compact_part").resolve("t").toString
    Tables.table(spark, sf0001, "orders")
      .selectExpr("o_orderkey", "year(cast(o_orderdate as date)) AS y")
      .write.partitionBy("y").parquet(dir)
    val e = intercept[IllegalArgumentException] {
      Layout.compact(spark, dir, 1L << 20)
    }
    assert(e.getMessage.contains("FLAT"))
  }

  test("quantizeInt8 round-trip error is bounded by one cell width per dim") {
    import org.apache.spark.sql.functions._
    import graft.vector.VectorFunctions
    val emb = Tables.table(spark, sf0001, "embeddings")
    val (mins, maxs) = VectorFunctions.fitQuantizer(emb, "embedding")
    assert(mins.length === 64 && maxs.length === 64)
    assert(mins.zip(maxs).forall { case (lo, hi) => lo <= hi })
    val cells = mins.zip(maxs).map { case (lo, hi) => (hi - lo) / 255.0 }
    val rows = emb.select($"vec_id", $"embedding",
        VectorFunctions.dequantizeInt8(
          VectorFunctions.quantizeInt8($"embedding", mins, maxs),
          mins, maxs).as("approx"))
      .as[(Long, Array[Float], Array[Double])].collect()
    rows.foreach { case (id, v, a) =>
      v.indices.foreach { i =>
        val err = math.abs(v(i).toDouble - a(i))
        assert(err <= cells(i) + 1e-12, s"vec $id dim $i err=$err")
      }
    }
    // codes are genuinely int8-ranged
    val qs = emb.select(VectorFunctions
        .quantizeInt8($"embedding", mins, maxs).as("q"))
      .select(explode($"q")).as[Int].collect()
    assert(qs.min >= 0 && qs.max <= 255)
    assert(qs.max > 200, "top of the range is actually used")
  }

  test("unknown-table merge guard raises (reference C6 semantics)") {
    val e = intercept[IllegalArgumentException] {
      Pipeline.mergeToWarehouse(spark, "/tmp/nope", "/tmp/nope2",
        TableKind.Unrecognized("mystery"), "2025-01-01")
    }
    assert(e.getMessage.contains("no upsert config"))
  }
}
