package graft

/** q253 weighted PageRank: scaled-BIGINT mass accounting and
  * determinism. With every nation holding at least one ordering
  * customer at sf0.001 there are no dangling nodes, so total mass is
  * conserved up to per-edge/per-node integer-floor loss — bounded by
  * ~|E|+|V| units per round against a 10¹² scale. */
class PageRankSpec extends SparkSpec {

  test("rank mass is conserved up to floor loss; output is 25 rows desc") {
    val rows = graft.queries.MiscQueries.pageRank(spark, sf).collect()
    assert(rows.length == 25)
    val total = rows.map(_.getLong(1)).sum
    assert(total <= 1000000000000L, s"mass created: $total")
    assert(total > 999000000000L, s"mass lost beyond floor error: $total")
    val key = rows.map(r => (-r.getLong(1), r.getString(0))).toSeq
    assert(key == key.sorted, "not ordered by rank desc, name")
  }

  test("two runs are bit-identical (integer arithmetic, no float drift)") {
    val a = graft.queries.MiscQueries.pageRank(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val b = graft.queries.MiscQueries.pageRank(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(a == b)
  }
}
