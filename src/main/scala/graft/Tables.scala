package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType, TimestampNTZType, TimestampType}

/** Table access layer over the driver-provided parquet star schema
  * (TESTDATA.md). Mirrors the reference's catalog surface
  * (ref: DE_data_preparation.py:23-29 managed tables) but parameterized by
  * scale-factor directory so the same query code runs at any SF.
  *
  * Scale note: each table is a plain parquet directory scan —
  * `spark.read.parquet` yields a vectorized columnar read with predicate
  * pushdown and column pruning handled by Catalyst, so downstream
  * operators decide the partitioning; nothing here forces a shuffle.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts has shipped as either TIMESTAMP(NANOS) (which Spark's
      // vectorized reader rejects — read nanos-as-long and floor to µs,
      // matching DuckDB's ns → us narrowing) or plain microsecond
      // TIMESTAMP / TIMESTAMP_NTZ (use as-is). Branch on the physical
      // dtype so a testdata regeneration can't break every events query.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      normalizeTs(raw)
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Normalize an events-shaped frame's `ts` column to TimestampType,
    * whatever the physical parquet encoding era: nanos-as-long (floor to
    * µs — same narrowing DuckDB applies), microsecond TIMESTAMP_NTZ
    * (reinterpret in the UTC session tz), or already TimestampType.
    * Works on batch AND streaming frames (schema is known pre-start), so
    * the readStream paths share the exact same dtype contract as
    * [[load]]. */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        // integer `div`, NOT `/ 1000`: epoch-ns exceeds 2^53, so the
        // double division path rounds ~12% of values by 1 µs off
        // DuckDB's exact ns→µs floor and can flip window membership
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // session tz is UTC so the instant is unchanged; cast keeps the
        // post-load schema (TimestampType) identical across dtype eras
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }

  /** Register every table as a temp view (ref: DS_cust_lifetime_value.py:67
    * createOrReplaceTempView bridging DataFrame ↔ SQL worlds). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))

  /** S13: cached scan (ref DS:66 `.cache()` on the train table) — use for
    * a table re-read by several queries in one session; storage is
    * MEMORY_AND_DISK so at cluster scale hot partitions pin in executor
    * memory and cold ones spill instead of failing. */
  def loadCached(spark: SparkSession, sfDir: String, name: String): DataFrame =
    load(spark, sfDir, name).cache()

  // ---------------------------------------------------------------------
  // Determinism helpers for the DuckDB-oracle differential gate.
  //
  // Double-precision SUM is order-dependent and Spark's partial/final
  // aggregation order is nondeterministic across runs, so a raw
  // sum(double) can differ from DuckDB's sequential sum in the last ulps
  // and flip a rounded digit. Summing exact decimals is associative →
  // bit-identical totals regardless of partitioning, at any scale.
  // ---------------------------------------------------------------------

  /** Order-insensitive exact money sum, surfaced as double.
    * DuckDB oracle equivalent: CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE). */
  def sumMoney(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Deterministic mean: exact decimal sum divided by count, in double.
    * DuckDB: CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / COUNT(x). */
  def avgMoney(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double") / count(c)

  /** Render timestamps as dates in ISO text so the oracle compare is not
    * sensitive to timestamp physical types (ms vs us vs ns).
    * DuckDB: strftime(x, '%Y-%m-%d'). */
  def isoDate(c: Column): Column = date_format(c, "yyyy-MM-dd")

  /** ISO second-resolution render for window bounds.
    * DuckDB: strftime(x, '%Y-%m-%d %H:%M:%S'). */
  def isoTs(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")
}
