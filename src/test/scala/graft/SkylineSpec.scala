package graft

import org.apache.spark.sql.functions._

/** q254 skyline: the linear binned-prefix-max plan must reproduce the
  * quadratic NOT-EXISTS dominance semantics exactly — proved here by
  * brute force over every part at sf0.001. */
class SkylineSpec extends SparkSpec {

  private def pts = spark.read.parquet(s"$sf/part.parquet")
    .select(col("p_partkey"),
      expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("pc"),
      col("p_size").cast("int").as("size"))
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))

  test("binned skyline equals brute-force dominance") {
    val got = graft.queries.MiscQueries.skylineParts(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val all = pts
    val want = all.filter { case (k, pc, sz) =>
      !all.exists { case (k2, pc2, sz2) =>
        k2 != k && pc2 <= pc && sz2 >= sz && (pc2 < pc || sz2 > sz)
      }
    }.toSet
    assert(got.nonEmpty)
    assert(got == want)
  }

  test("skyline members are mutually non-dominating") {
    val got = graft.queries.MiscQueries.skylineParts(spark, sf).collect()
      .map(r => (r.getLong(1), r.getInt(2)))
    got.foreach { case (pc, sz) =>
      got.foreach { case (pc2, sz2) =>
        assert(!(pc2 <= pc && sz2 >= sz && (pc2 < pc || sz2 > sz)),
          s"($pc2,$sz2) dominates ($pc,$sz) inside the reported frontier")
      }
    }
  }
}
