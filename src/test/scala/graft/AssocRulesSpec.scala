package graft

/** q252 association rules: structural laws the Apriori output must
  * satisfy (the value-level check is the DuckDB oracle's full replay). */
class AssocRulesSpec extends SparkSpec {

  test("rule laws: support bounds, symmetry, confidence/lift identities") {
    val rows = graft.queries.MiscQueries.assocRules(spark, sf).collect()
    assert(rows.nonEmpty)
    val byPair = rows.map { r =>
      ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6)))
    }.toMap
    byPair.foreach { case ((a, b), (sp, sa, sc, conf, lift)) =>
      // a pair's support can never exceed either item's own support
      assert(sp >= 3 && sp <= math.min(sa, sc), s"support bounds broken $a->$b")
      assert(conf > 0 && conf <= 1.0, s"confidence out of range $a->$b")
      assert(lift > 0, s"lift non-positive $a->$b")
      // both directions present, sharing supp_pair and lift
      val rev = byPair((b, a))
      assert(rev._1 == sp, s"reverse direction lost the pair support $a<->$b")
      assert(math.abs(rev._5 - lift) < 1e-9, s"lift is symmetric $a<->$b")
      // confidence identity: conf = supp_pair / supp_ante at 6 dp
      assert(math.abs(conf - math.rint(sp.toDouble / sa * 1e6) / 1e6) < 1e-9 ||
        math.abs(conf - sp.toDouble / sa) < 5e-7,
        s"confidence identity broken $a->$b")
    }
  }
}
