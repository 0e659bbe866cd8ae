package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.mapreduce.{Job, TaskAttemptID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.{ParquetOptions, ParquetWriteSupport}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Group-based row-level operations (SQL `MERGE INTO` / `UPDATE` / and
  * the non-pushable `DELETE` fallback) for the graft-lake catalog.
  *
  * Architecture — the standard DSv2 group-replace protocol that
  * Iceberg's copy-on-write mode uses: the analyzer rewrites the DML
  * statement into a [[org.apache.spark.sql.catalyst.plans.logical.ReplaceData]]
  * plan that (a) reads the target through THIS operation's scan,
  * (b) computes the surviving/updated rows, and (c) hands them to this
  * operation's write, whose commit replaces the read groups with the
  * new files — one atomic manifest version, time travel intact.
  *
  * Group granularity is the WHOLE TABLE (the scan exposes no runtime
  * file filtering), so a SQL MERGE rewrites every row group — correct
  * at any scale but write-amplified; the file-group-targeted path
  * remains [[LakeTable.merge]], and the scaladoc on q155 says exactly
  * that. Executor-side writing reuses Spark's own parquet
  * OutputWriter machinery (ParquetWriteSupport.prepareWrite), so the
  * written files are byte-compatible with every other commit path. */
private[sources] final class GraftRowLevelOperation(
    root: String, cmd: RowLevelOperation.Command)
    extends RowLevelOperation {

  override def command(): RowLevelOperation.Command = cmd

  /** The rewrite reads the CURRENT snapshot — through a ScanBuilder
    * that exposes NO pushdown interfaces. This is deliberate, not an
    * omission: in the group-replace contract, the condition Spark
    * offers this scan is a GROUP filter ("you may skip groups with no
    * matches"), not a row filter — a source that row-filters here
    * silently drops every carryover row of the affected groups (and
    * with whole-table granularity, the unaffected rows too). Since the
    * write replaces the whole table, the scan must return every row;
    * accepting no pushdown guarantees it. */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val delegate = GraftLakeSource.delegate(SparkSession.active, root, None,
      None, java.util.Collections.emptyMap[String, String]())
      .newScanBuilder(options)
    new ScanBuilder {
      override def build(): org.apache.spark.sql.connector.read.Scan =
        delegate.build()
    }
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write =
        new GraftReplaceWrite(root, info.schema(), cmd.toString.toLowerCase)
    }
}

/** The replacing write: executors stream InternalRows into parquet
  * files under a fresh `data/<uuid>` dir; the driver commit publishes
  * that dir as the table's next version (replacing all prior groups —
  * see [[GraftRowLevelOperation]] for why whole-table granularity). */
private[sources] final class GraftReplaceWrite(
    root: String, schema: StructType, op: String) extends Write {

  override def toBatch: BatchWrite = {
    val spark = SparkSession.active
    // Spark's own parquet write preparation: fills the hadoop conf with
    // every key ParquetWriteSupport.init reads (schema, legacy format,
    // timestamp type, rebase modes) — no hand-maintained key list
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    val factory = org.apache.spark.sql.execution.datasources.parquet
      .ParquetUtils.prepareWrite(
        spark.sessionState.conf, job, schema,
        new ParquetOptions(Map.empty[String, String], spark.sessionState.conf))
    val confEntries = {
      import scala.jdk.CollectionConverters._
      job.getConfiguration.iterator().asScala
        .map(e => (e.getKey, e.getValue)).toArray
    }
    val dataDir = s"data/${java.util.UUID.randomUUID()}"
    new GraftReplaceBatchWrite(root, dataDir, schema, factory, confEntries, op)
  }
}

private[sources] final class GraftReplaceBatchWrite(
    root: String, dataDir: String, schema: StructType,
    factory: OutputWriterFactory, confEntries: Array[(String, String)],
    op: String) extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new GraftReplaceWriterFactory(s"$root/$dataDir", schema, factory,
      confEntries)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val wrote = messages.collect { case GraftFileCommitted(n) => n }
    if (wrote.isEmpty) {
      // zero surviving rows: publish a readable empty group so the new
      // version scans to an empty frame instead of failing
      spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .coalesce(1).write.parquet(s"$root/$dataDir")
    }
    LakeTable.commitReplacing(spark, root, dataDir, op)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val p = new org.apache.hadoop.fs.Path(s"$root/$dataDir")
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (f.exists(p)) f.delete(p, true)
  }
}

private[sources] final case class GraftFileCommitted(file: String)
    extends WriterCommitMessage

private[sources] final class GraftReplaceWriterFactory(
    absDataDir: String, schema: StructType,
    factory: OutputWriterFactory, confEntries: Array[(String, String)])
    extends DataWriterFactory {

  override def createWriter(partitionId: Int,
                            taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private lazy val (writer, file) = {
        val conf = new Configuration(false)
        confEntries.foreach { case (k, v) => conf.set(k, v) }
        val ctx = new TaskAttemptContextImpl(conf,
          new TaskAttemptID("graft", 0, TaskType.MAP, partitionId,
            (taskId % Int.MaxValue).toInt))
        val name =
          f"part-$partitionId%05d-$taskId${factory.getFileExtension(ctx)}"
        (factory.newInstance(s"$absDataDir/$name", schema, ctx), name)
      }
      private var any = false

      // ReplaceData's plain-task path delivers the query rows RAW:
      // [__row_operation: int | table columns...] (the projecting task
      // is only chosen when the operation declares metadata attributes
      // — ReplaceDataExec.writingTask). Mirror its contract here: the
      // op int drives keep-vs-drop (DELETE-tagged rows exist for SQL
      // metrics, not for the table), and the data columns shift by one.
      private lazy val dropOp =
        org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(
          schema.fields.toIndexedSeq.zipWithIndex.map { case (sf, i) =>
            org.apache.spark.sql.catalyst.expressions.BoundReference(
              i + 1, sf.dataType, sf.nullable)
          })

      override def write(row: InternalRow): Unit =
        if (row.numFields == schema.length + 1) {
          if (row.getInt(0) !=
              org.apache.spark.sql.catalyst.util.RowDeltaUtils.DELETE_OPERATION) {
            any = true
            writer.write(dropOp(row))
          }
        } else { any = true; writer.write(row) }

      override def commit(): WriterCommitMessage =
        if (any) { writer.close(); GraftFileCommitted(file) }
        // no rows reached this task: nothing was opened, nothing to add
        else GraftFileCommitted.empty

      override def abort(): Unit = if (any) {
        writer.close()
        val p = new org.apache.hadoop.fs.Path(s"$absDataDir/$file")
        val f = p.getFileSystem(new Configuration())
        if (f.exists(p)) f.delete(p, false)
      }

      override def close(): Unit = ()
    }
}

private[sources] object GraftFileCommitted {
  /** Marker for "this task wrote nothing" (filtered out at commit). */
  val empty: WriterCommitMessage = new WriterCommitMessage {}
}
