package graft.util

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Shared scaffolding for queries whose results must outlive transient
  * inputs (temp dirs, staged streams, per-run tables). */
object LocalFrame {

  /** Rebuild a DataFrame from already-collected rows — the frame owns
    * its data, so the source it was computed from can be deleted. */
  def of(s: SparkSession, rows: Array[Row], schema: StructType): DataFrame =
    s.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(rows: _*)), schema)

  /** Materialize a frame into a driver-local copy (bounded results only). */
  def materialize(df: DataFrame): DataFrame =
    of(df.sparkSession, df.collect(), df.schema)

  /** Scope a session conf to `body`, restoring the prior value (or
    * unsetting) even on failure — queries on the shared session must not
    * leak conf changes into later queries. */
  def withConf[A](s: SparkSession, key: String, value: String)(body: => A): A = {
    val prior = s.conf.getOption(key)
    s.conf.set(key, value)
    try body
    finally prior match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
  }

  /** Scope several session confs to `body` (nested [[withConf]]s — each
    * restored innermost-first even on failure). */
  def withConfs[A](s: SparkSession, kvs: (String, String)*)(body: => A): A =
    kvs.foldRight(() => body) { case ((k, v), inner) =>
      () => withConf(s, k, v)(inner())
    }()

  /** Frees the cached blocks behind a `localCheckpoint(true)`ed frame.
    * `Dataset.unpersist` only consults the CacheManager (entries made by
    * `persist`), so checkpoints would otherwise linger in executor
    * storage until the ContextCleaner GCs them. Safe only once nothing
    * downstream reads the frame again (the checkpoint blocks ARE the
    * data; there is no lineage to recompute from). */
  def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        r.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Scope the legacy parquet nanos-as-long toggle to `body` — the
    * events parquet carries nanosecond timestamps that the streaming
    * file source can only read as longs, and leaking the toggle would
    * silently change timestamp decoding for every later query on the
    * shared session. */
  def withNanosAsLong[A](s: SparkSession)(body: => A): A =
    withConf(s, "spark.sql.legacy.parquet.nanosAsLong", "true")(body)
}
