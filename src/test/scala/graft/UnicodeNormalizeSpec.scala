package graft

import graft.functions.{GraftFunctions, NormalizeExpr, StripAccentsExpr, UnicodeNormalize}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonicalization expressions (q179 surface): strip-accents
  * semantics vs DuckDB's (ß/CJK pass through), NFC composition, NFKC
  * compat folds, the ASCII fast path, and both invocation surfaces
  * (Column wrapper and registered SQL function — the latter exercises
  * codegen through a real plan). */
class UnicodeNormalizeSpec extends SparkSpec {

  private def u(s: String) = UTF8String.fromString(s)

  test("strip_accents removes marks, keeps eszett and CJK") {
    assert(UnicodeNormalize.stripAccents(u("café ÉCOLE naïve"))
      .toString == "cafe ECOLE naive")
    assert(UnicodeNormalize.stripAccents(u("straße")).toString == "straße")
    assert(UnicodeNormalize.stripAccents(u("中文")).toString == "中文")
    // decomposed input strips identically to precomposed
    assert(UnicodeNormalize.stripAccents(u("é")).toString == "e")
  }

  test("ASCII fast path returns the input buffer untouched") {
    val s = u("plain ascii text")
    assert(UnicodeNormalize.stripAccents(s) eq s)
    assert(UnicodeNormalize.nfc(s) eq s)
  }

  test("NFC composes, NFKC folds compatibility forms") {
    assert(UnicodeNormalize.nfc(u("é")).numChars == 1)
    assert(UnicodeNormalize.nfkc(u("ﬁ①")).toString == "fi1")
    // NFC leaves compatibility forms alone
    assert(UnicodeNormalize.nfc(u("ﬁ")).toString == "ﬁ")
  }

  test("Column and SQL surfaces agree through codegen") {
    import spark.implicits._
    val df = Seq("café", "straße", "école", "ascii", null)
      .toDF("s")
    val viaColumn = df.select(
      StripAccentsExpr(col("s")).as("stripped"),
      NormalizeExpr(col("s"), "NFC").as("nfc")).collect()
    assert(viaColumn.map(r => Option(r.getString(0)).orNull).toSeq ==
      Seq("cafe", "straße", "ecole", "ascii", null))
    assert(viaColumn(2).getString(1) == "école")

    GraftFunctions.register(spark)
    df.createOrReplaceTempView("unistrings")
    val viaSql = spark.sql(
      """SELECT strip_accents(s) AS a, unicode_normalize(s, 'NFKC') AS b
        |FROM unistrings WHERE s IS NOT NULL ORDER BY s""".stripMargin)
      .collect()
    assert(viaSql.map(_.getString(0)).toSeq.sorted ==
      Seq("ascii", "cafe", "ecole", "straße").sorted)
  }

  test("unknown normalization form fails at analysis") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT unicode_normalize('x', 'NFX')").collect()
    }
    assert(e.getMessage.contains("NFX") ||
      Option(e.getCause).exists(_.getMessage.contains("NFX")))
  }
}
