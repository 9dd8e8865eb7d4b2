package graft

class EntrySpec extends SparkSpec {
  test("driver entry: profiles sf0.001 lineitem with rows > 0") {
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    assert(rows.length == 11)
    assert(rows.forall(_.getAs[Long]("n") == 6000))
  }

  test("every oracleSql key exists in queries (driver contract)") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    // every query is oracle-checked except the rows-only flagship profile;
    // derived (not hardcoded) so adding a query can't silently break this
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set("q00_profile_lineitem", "q00b_profile_sketch"),
      s"unexpected rows-only (no-oracle) queries: $rowsOnly")
  }
}
