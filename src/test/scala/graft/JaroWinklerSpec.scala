package graft

import graft.functions.{GraftFunctions, JaroWinklerExpr}
import org.apache.spark.sql.functions._

/** Jaro-Winkler expression (q190 surface): textbook golden values,
  * the DuckDB-matched edge semantics (empty → 0, boost threshold 0.7,
  * floor window), and both invocation surfaces. */
class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    JaroWinklerExpr.similarity(a, b)

  test("textbook golden values") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-12)
    assert(math.abs(jw("CRATE", "TRACE") - 0.7333333333333334) < 1e-12)
    assert(jw("abc", "abc") == 1.0)
  }

  test("edge semantics match the oracle implementation") {
    assert(jw("", "") == 0.0)
    assert(jw("a", "") == 0.0)
    // below the 0.7 boost threshold the shared prefix earns nothing
    assert(math.abs(jw("aaaab", "aacccccc") - 0.5499999999999999) < 1e-12)
    assert(math.abs(jw("abcdefgh", "abxxxxxx") - 0.5) < 1e-12)
    // window floor: length-3 strings get window 0, only exact positions
    assert(math.abs(jw("xab", "xba") - 0.5555555555555555) < 1e-12)
    // odd mismatch count floors (t = 3/2 = 1, not 1.5) — the oracle's
    // integer-division rule; 0.566667 would mean t/2.0
    assert(math.abs(jw("blue anvil", "large bolt") - 0.6) < 1e-12)
  }

  test("Column and SQL surfaces agree through codegen") {
    import spark.implicits._
    val df = Seq(("MARTHA", "MARHTA"), ("DWAYNE", "DUANE")).toDF("a", "b")
    val viaColumn = df.select(JaroWinklerExpr(col("a"), col("b"))).collect()
      .map(_.getDouble(0))
    assert(math.abs(viaColumn(0) - 0.9611111111111111) < 1e-12)
    GraftFunctions.register(spark)
    df.createOrReplaceTempView("jwpairs")
    val viaSql = spark.sql("SELECT jaro_winkler(a, b) FROM jwpairs")
      .collect().map(_.getDouble(0))
    assert(viaColumn.toSeq == viaSql.toSeq)
  }
}
