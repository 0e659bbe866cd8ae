package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Ingestion & catalog surface (SURVEY.md §2.1 S1–S13) — the reference's
  * DE notebook operations re-expressed as library calls:
  * CSV-with-options scan (ref DE_data_preparation.py:3-16), managed-table
  * sink (ref DE:28-29), database/table DDL (ref DE:23-24), CTAS (ref
  * DS:352-354), temp views (ref DS:67), DESCRIBE (ref DS:72), cache (ref
  * DS:66). Parquet stands in for Delta (offline build — see SURVEY §1.1;
  * the operations exercised are format-agnostic).
  */
object Ingest {

  /** S1: CSV scan with the reference's option set (infer schema, header
    * row, configurable delimiter). */
  def readCsv(spark: SparkSession, path: String, sep: String = ","): DataFrame =
    spark.read
      .option("inferSchema", "true")
      .option("header", "true")
      .option("sep", sep)
      .csv(path)

  /** JSON-lines scan with schema inference ([EXT] source format). */
  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** ORC scan ([EXT] source format — columnar alternative to parquet,
    * same pushdown/pruning machinery). */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** S5: idempotent database creation. */
  def createDatabase(spark: SparkSession, db: String): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")

  /** S6: idempotent drop. */
  def dropTable(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $table")

  /** S4: persist as a managed catalog table (overwrite semantics mirror
    * the notebook's drop-then-save pattern). An orphaned warehouse
    * location (directory left by a previous process whose in-memory
    * catalog is gone) is removed first — otherwise CREATE fails with
    * LOCATION_ALREADY_EXISTS. */
  def saveAsManagedTable(df: DataFrame, table: String): Unit = {
    val spark = df.sparkSession
    dropTable(spark, table)
    cleanOrphanLocation(spark, table)
    df.write.format("parquet").mode(SaveMode.Overwrite).saveAsTable(table)
  }

  /** Remove a managed-table directory left behind by a previous process
    * whose in-memory catalog is gone. The location is resolved through
    * the session catalog (handles `db.table` → `<wh>/db.db/table`), never
    * by naive string substitution. */
  private def cleanOrphanLocation(spark: SparkSession, table: String): Unit = {
    val parts = table.split('.')
    val ident =
      if (parts.length == 2)
        org.apache.spark.sql.catalyst.TableIdentifier(parts(1), Some(parts(0)))
      else org.apache.spark.sql.catalyst.TableIdentifier(table)
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(ident))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** S7: CREATE TABLE AS SELECT. */
  def ctas(spark: SparkSession, table: String, query: String): DataFrame = {
    dropTable(spark, table)
    spark.sql(s"CREATE TABLE $table USING parquet AS $query")
    spark.table(table)
  }

  /** S2: catalog scan by name. */
  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.read.table(table)

  /** S12: schema introspection. */
  def describe(spark: SparkSession, table: String): DataFrame =
    spark.sql(s"DESCRIBE $table")

  /** Bucketed managed table: pre-shuffles data into `buckets` files per
    * the key so equi-joins and aggregations on that key plan with NO
    * exchange (Catalyst recognizes the bucketing as a satisfied
    * HashClusteredDistribution). At 100 TB this converts every recurring
    * fact⋈fact join on the bucket key from a full shuffle into a local
    * zip of co-located buckets — the single biggest recurring-shuffle
    * eliminator Spark offers. */
  def saveBucketed(df: DataFrame, table: String, bucketKey: String,
                   buckets: Int): Unit = {
    val spark = df.sparkSession
    dropTable(spark, table)
    cleanOrphanLocation(spark, table)
    df.write.format("parquet")
      .bucketBy(buckets, bucketKey)
      .sortBy(bucketKey)
      .mode(SaveMode.Overwrite)
      .saveAsTable(table)
  }

  /** Hive-style directory partitioning: the other half of the layout
    * story beside [[saveBucketed]]. Partition columns become directories
    * (`yr=1998/...`), so any scan filtered on them prunes whole
    * directories at PLANNING time — the `PartitionFilters` line in the
    * physical plan, zero I/O for excluded partitions. At 100 TB this is
    * the date-partitioned fact-table pattern: a year's query touches a
    * year's files, never the decade's. */
  def savePartitioned(df: DataFrame, path: String,
                      partitionCols: String*): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Reference-fixture replay: ingest an RFM summary CSV shaped like the
    * reference's Summary_2011 (CustomerID,T1,recency1,FREQUENCY,profit)
    * into the catalog and return it (ref DE:55-77). */
  def ingestSummaryCsv(spark: SparkSession, path: String,
                       table: String): DataFrame = {
    val df = readCsv(spark, path)
    saveAsManagedTable(df, table)
    readTable(spark, table)
  }
}
