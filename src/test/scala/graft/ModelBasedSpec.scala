package graft

import java.sql.Timestamp

import graft.operators.AsOfJoin
import graft.sources.LakeTable
import org.apache.spark.sql.functions._

/** Model-based tests: run the distributed operators on randomized (but
  * seeded, reproducible) inputs and compare against trivially-correct
  * in-memory reference models. */
class ModelBasedSpec extends SparkSpec {

  private val rng = new scala.util.Random(20260812L)

  test("AsOfJoin equals the brute-force reference on random data") {
    import spark.implicits._
    // random left/right rows over a small key space with colliding times
    val leftRows = (1 to 300).map { i =>
      (i.toLong, rng.nextInt(8).toLong, rng.nextInt(1000).toLong)
    } // (lid, key, t)
    val rightRows = (1 to 200).map { i =>
      (i.toLong, rng.nextInt(8).toLong, rng.nextInt(1000).toLong)
    } // (rid, key, t)

    val left = leftRows
      .map { case (l, k, t) => (l, k, new Timestamp(t * 1000L)) }
      .toDF("lid", "k", "lt")
    val right = rightRows
      .map { case (r, k, t) => (r, k, new Timestamp(t * 1000L)) }
      .toDF("rid", "k", "rt")

    val got = AsOfJoin.joinAsOf(left, right, "k", "lt", "rt", "rid", Seq("rid"))
      .select(col("lid"), col("_asof.rid").as("m"))
      .collect().map(r => r.getLong(0) -> Option(r.getAs[Any]("m"))).toMap

    // reference model: for each left row, max (t, rid) among right rows
    // with same key and t <= left t
    val expect = leftRows.map { case (l, k, t) =>
      val candidates = rightRows.filter(r => r._2 == k && r._3 <= t)
      l -> (if (candidates.isEmpty) None
            else Some(candidates.maxBy(r => (r._3, r._1))._1))
    }.toMap

    assert(got.size == expect.size)
    expect.foreach { case (l, e) =>
      assert(got(l).map(_.asInstanceOf[Long]) == e,
        s"left $l: got ${got(l)} expected $e")
    }
  }

  test("LakeTable random op sequence equals an in-memory model") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_model").toString
    try {
      var model = Map.empty[Long, Double] // id -> value
      def rows(n: Int): Seq[(Long, Double)] =
        (1 to n).map(_ => (rng.nextInt(60).toLong,
          (rng.nextInt(1000) + 1).toDouble))
      // create
      val first = rows(10).distinctBy(_._1)
      LakeTable.create(spark, dir, first.toDF("id", "v"))
      model = first.toMap
      for (step <- 1 to 12) {
        rng.nextInt(3) match {
          case 0 => // append new ids only (append semantics = multiset add;
                    // keep model simple by appending fresh ids)
            val fresh = rows(5).distinctBy(_._1)
              .filterNot(r => model.contains(r._1))
            if (fresh.nonEmpty) {
              LakeTable.append(spark, dir, fresh.toDF("id", "v"))
              model ++= fresh
            }
          case 1 => // merge upsert
            val ups = rows(6).distinctBy(_._1)
            LakeTable.merge(spark, dir, ups.toDF("id", "v"), "id")
            model ++= ups
          case 2 => // delete a value range
            val cut = rng.nextInt(1000).toDouble
            LakeTable.deleteWhere(spark, dir, col("v") > cut)
            model = model.filter(_._2 <= cut)
        }
        val got = LakeTable.read(spark, dir)
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        assert(got == model, s"divergence at step $step")
      }
    } finally {
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(dir)
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(q => java.nio.file.Files.deleteIfExists(q))
    }
  }
}
