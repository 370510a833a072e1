package graft

import graft.sources.CatalogStats

/** Registration semantics of the stats catalog (round-11 advice):
  * a first caller registering a SUBSET of tables for a dir must not
  * block a later caller from registering the rest, and registering a
  * second data directory in the same session must not repoint the
  * first directory's tables at different data.
  */
class CatalogStatsSpec extends SparkSpec {
  private val small = "/root/testdata/sf0.001"
  private val big = "/root/testdata/sf0.01"

  test("subset registration does not block later tables for the same dir") {
    // first caller registers only customer+orders (the CboPlanSpec
    // shape); a later caller needs region too — pre-fix this was a
    // memoized no-op and the table lookup failed
    CatalogStats.register(spark, small, Seq("customer", "orders"))
    CatalogStats.register(spark, small, Seq("region", "nation"))
    assert(spark.table(CatalogStats.name(small, "region")).count() == 5L)
    assert(spark.table(CatalogStats.name(small, "nation")).count() == 25L)
  }

  test("two dirs in one session keep distinct names and distinct data") {
    CatalogStats.register(spark, small, Seq("customer"))
    CatalogStats.register(spark, big, Seq("customer"))
    val nSmall = spark.table(CatalogStats.name(small, "customer")).count()
    val nBig = spark.table(CatalogStats.name(big, "customer")).count()
    assert(CatalogStats.name(small, "customer") !=
      CatalogStats.name(big, "customer"))
    assert(nSmall < nBig,
      s"sf0.001 customer ($nSmall) should be smaller than sf0.01 ($nBig) — " +
        "a shared table name would have silently repointed the first dir")
    // re-registering the first dir afterwards still reads ITS data
    CatalogStats.register(spark, small, Seq("customer"))
    assert(spark.table(CatalogStats.name(small, "customer")).count() == nSmall)
  }
}
