package graft

import java.nio.file.{Files, Paths}

import graft.serve.ResultCache

/** serve.ResultCache: the fingerprint keys on plan SEMANTICS (two
  * different DataFrame call sequences building the same query share an
  * entry; any literal/column/path change re-keys), a hit re-reads
  * without rewriting, and the round-trip is value-exact.
  */
class ResultCacheSpec extends SparkSuite {
  import spark.implicits._

  private def q(dir: String, cut: Int) =
    Tables.table(spark, dir, "nation")
      .filter($"n_regionkey" < cut)
      .groupBy($"n_regionkey").count()

  test("hit re-reads the stored result without rewriting") {
    val cache = tmpDir("rescache").toString
    val first = ResultCache.through(spark, cache, q(sf0001, 3))
    val fp = ResultCache.fingerprint(q(sf0001, 3))
    val marker = Paths.get(cache, fp, "_SUCCESS")
    assert(Files.exists(marker), "miss did not persist an entry")
    val t0 = Files.getLastModifiedTime(marker)
    val second = ResultCache.through(spark, cache, q(sf0001, 3))
    assert(Files.getLastModifiedTime(marker) === t0,
      "hit rewrote the cache entry")
    assert(second.orderBy("n_regionkey").collect().toSeq ===
      first.orderBy("n_regionkey").collect().toSeq)
    // and value-exact vs computing directly
    assert(second.orderBy("n_regionkey").as[(Int, Long)].collect().toSeq
      === q(sf0001, 3).orderBy("n_regionkey").as[(Int, Long)]
        .collect().toSeq)
  }

  test("literal or input change re-keys; equivalent builds share a key") {
    val base = ResultCache.fingerprint(q(sf0001, 3))
    assert(ResultCache.fingerprint(q(sf0001, 4)) !== base,
      "different literal must re-key")
    // same query built through a different (but semantically equal)
    // call sequence — filter pushed after the read in two steps
    val alt = Tables.table(spark, sf0001, "nation")
      .where($"n_regionkey" < 3)
      .groupBy($"n_regionkey").count()
    assert(ResultCache.fingerprint(alt) === base,
      "semantically equal plans must share the fingerprint")
  }

  test("QueryRegistry.cached serves the named surface through the " +
      "cache: miss computes, hit re-reads, data change re-keys") {
    import graft.serve.QueryRegistry
    val cache = tmpDir("regcache").toString
    val src = tmpDir("regcache-src").toString
    Tables.table(spark, sf0001, "customer").limit(7)
      .write.mode("overwrite").parquet(src)
    spark.read.parquet(src).createOrReplaceTempView("dim_clientes")
    val name = "conteo_total_clientes" // one of the three Athena texts
    assert(!QueryRegistry.isCached(spark, name, cache))
    assert(QueryRegistry.cached(spark, name, cache)
      .as[Long].head() === 7L)
    assert(QueryRegistry.isCached(spark, name, cache), "miss must persist")
    // hit path: same value, entry not rewritten
    val fp = ResultCache.fingerprint(QueryRegistry.run(spark, name))
    val marker = Paths.get(cache, fp, "_SUCCESS")
    val t0 = Files.getLastModifiedTime(marker)
    assert(QueryRegistry.cached(spark, name, cache).as[Long].head() === 7L)
    assert(Files.getLastModifiedTime(marker) === t0, "hit rewrote entry")
    // invalidation = re-keying: new data behind the registered view
    // makes the SAME name a cache miss (the stale entry is never read)
    Thread.sleep(5) // mtime granularity
    Tables.table(spark, sf0001, "customer").limit(9)
      .write.mode("overwrite").parquet(src)
    spark.read.parquet(src).createOrReplaceTempView("dim_clientes")
    assert(!QueryRegistry.isCached(spark, name, cache),
      "data change must re-key the named query")
    assert(QueryRegistry.cached(spark, name, cache).as[Long].head() === 9L)
  }

  test("rewriting the data behind a cached path re-keys (no stale hit)") {
    val dir = tmpDir("rescache-src").toString
    Tables.table(spark, sf0001, "nation").limit(3)
      .write.mode("overwrite").parquet(dir)
    def rq = spark.read.parquet(dir).groupBy($"n_regionkey").count()
    val before = ResultCache.fingerprint(rq)
    Thread.sleep(5) // mtime granularity
    Tables.table(spark, sf0001, "nation").limit(5)
      .write.mode("overwrite").parquet(dir)
    assert(ResultCache.fingerprint(rq) !== before,
      "same path + new data must produce a new fingerprint")
  }
}
