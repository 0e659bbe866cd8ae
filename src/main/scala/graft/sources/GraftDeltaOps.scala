package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{Job, TaskAttemptID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.{ParquetFileFormat, ParquetOptions, ParquetUtils}
import org.apache.spark.sql.execution.datasources.{FileFormat => DsFileFormat, PartitionedFile}
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DELTA-based row-level operations (Spark's [[SupportsDelta]]) — the
  * MERGE-ON-READ write path for the FULL SQL row-level surface:
  * conditional `WHEN MATCHED [AND …] THEN UPDATE/DELETE`, `WHEN NOT
  * MATCHED [BY SOURCE] …` — everything the group-replace rewrite
  * ([[GraftRowLevelOperation]]) serves copy-on-write, served as ONE
  * deletion-vector commit instead: Spark's WriteDelta plan hands each
  * affected row to [[GraftDeltaWriter]] as an insert / update / delete
  * against the row's (`__file`, `__pos`) identity, tasks persist the
  * masked positions as dv-sidecar parquet parts and the new rows as a
  * fresh data group, and the driver commit publishes
  * `dv += sidecar, dirs += group` — every pre-existing data file
  * byte-identical. Engaged under `spark.graft.update.mode = mor` (the
  * same opt-in the parser-level canonical shapes use); copy-on-write
  * stays the default. Works ON TOP of existing deletion vectors: the
  * operation's scan skips already-masked rows (they must not re-match
  * a MERGE), so MOR statements stack.
  *
  * Scan contract: filters are accepted for GROUP pruning only and all
  * reported residual — Spark re-applies the row-level condition above
  * the scan (delta semantics need exact rows, the opposite of the
  * group-replace protocol's carryover contract). Masked files read
  * whole-file so the sequential row counter IS the dv position space
  * (the [[GraftDvBatchScan]] recipe, shared mask codec). */
private[sources] final class GraftDeltaOperation(
    root: String, cmd: RowLevelOperation.Command)
    extends RowLevelOperation with SupportsDelta {

  override def command(): RowLevelOperation.Command = cmd
  override def description(): String = s"graft-lake delta $cmd `$root`"

  override def rowId(): Array[NamedReference] =
    Array(Expressions.column(LakeTable.FileCol),
      Expressions.column(LakeTable.PosCol))

  override def representUpdateAsDeleteAndInsert(): Boolean = false

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftDeltaScanBuilder(root)

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new GraftDeltaWrite(root,
        info.schema(), GraftDeltaOperation.opName(cmd))
    }
}

private[sources] object GraftDeltaOperation {
  /** Committed op names MATCH the parser-level MOR verbs', so the CDF
    * reconstruction arm ([[GraftLakeCdfStream]]) classifies delta
    * commits identically: masked rows of an update-mor are
    * update_preimage + the appended group update_postimage, delete-dv
    * masks are delete. Delta MERGE commits record no merge key, so a
    * sidecar-less CDF read of one refuses (enable the feed for merges
    * — the documented boundary). */
  def opName(cmd: RowLevelOperation.Command): String =
    cmd.toString.toUpperCase match {
      case "UPDATE" => "update-mor"
      case "DELETE" => "delete-dv"
      case _        => "merge-mor"
    }
}

private[sources] final class GraftDeltaScanBuilder(root: String)
    extends ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
  import org.apache.spark.sql.sources.Filter

  private val spark = SparkSession.active
  private val tableSchema = LakeTable.snapshotSchema(spark, root)
  private var required: StructType = tableSchema
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters
    filters // ALL residual: delta semantics need exact row filtering
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new GraftDeltaScan(root, tableSchema, required, pushed.toSeq)
}

/** One partition per live parquet file (group-pruned by the manifest
  * admission chain); each row is served with its (`__file`, `__pos`)
  * identity appended on demand and already-masked rows skipped. */
private[sources] final class GraftDeltaScan(
    root: String, tableSchema: StructType, required: StructType,
    filters: Seq[org.apache.spark.sql.sources.Filter])
    extends Scan with Batch {

  private def spark = SparkSession.active

  private lazy val planned: Seq[String] =
    LakeTable.pruneDirsForFilters(spark, root, None, filters)._1

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-lake delta scan `$root` (${planned.size} group(s))"

  override def planInputPartitions(): Array[InputPartition] = {
    val f = LakeTable.fileSystem(spark, root)
    val v = LakeTable.latestVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"no table at $root"))
    val masks = GraftDvBatchScan.loadMasks(spark, root,
      LakeTable.manifestMetaAt(spark, root, v))
    planned.flatMap { d =>
      f.listStatus(new Path(root, d))
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        .sortBy(_.getPath.getName)
        .map(st => GraftDeltaFilePartition(st.getPath.toString, st.getLen,
          masks.getOrElse(st.getPath.toString, null)): InputPartition)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // the reader always consumes the full data row (lineage columns are
    // computed, data columns projected afterwards) — masked files must
    // read whole-file anyway for the position counter
    val dataSchema = tableSchema
    val readFn = new ParquetFileFormat().buildReaderWithPartitionValues(
      sparkSession = spark,
      dataSchema = dataSchema,
      partitionSchema = StructType(Nil),
      requiredSchema = dataSchema,
      filters = Nil,
      options = Map(DsFileFormat.OPTION_RETURNING_BATCH -> "false"),
      hadoopConf = spark.sessionState.newHadoopConf())
    new GraftDeltaReaderFactory(readFn, dataSchema, required)
  }
}

private[sources] final case class GraftDeltaFilePartition(
    path: String, length: Long, mask: Array[Byte]) extends InputPartition

private[sources] final class GraftDeltaReaderFactory(
    readFn: PartitionedFile => Iterator[InternalRow],
    dataSchema: StructType, required: StructType)
    extends PartitionReaderFactory {

  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] = {
    val fp = p.asInstanceOf[GraftDeltaFilePartition]
    val pf = PartitionedFile(
      new GenericInternalRow(Array.empty[Any]),
      SparkPath.fromPathString(fp.path), 0, fp.length)
    val fileU = UTF8String.fromString(fp.path)
    // output column plan: each required field is either a data-column
    // ordinal or a computed lineage value
    val FileIdx = -1; val PosIdx = -2
    val srcIdx = required.fields.map { f =>
      if (f.name.equalsIgnoreCase(LakeTable.FileCol)) FileIdx
      else if (f.name.equalsIgnoreCase(LakeTable.PosCol)) PosIdx
      else dataSchema.fieldIndex(f.name)
    }
    val srcTypes = srcIdx.map {
      case FileIdx => StringType
      case PosIdx  => LongType
      case i       => dataSchema.fields(i).dataType
    }
    val cursor =
      if (fp.mask == null) null else new DvMaskCodec.Cursor(fp.mask)
    var nextMasked =
      if (cursor != null && cursor.hasNext) cursor.next() else -1L
    var pos = -1L
    val it: Iterator[InternalRow] = readFn(pf).flatMap { r =>
      pos += 1
      if (pos == nextMasked) {
        nextMasked =
          if (cursor != null && cursor.hasNext) cursor.next() else -1L
        Iterator.empty
      } else {
        val out = new GenericInternalRow(required.length)
        var i = 0
        while (i < required.length) {
          out.update(i, srcIdx(i) match {
            case FileIdx => fileU
            case PosIdx  => pos
            case src     => r.get(src, srcTypes(i))
          })
          i += 1
        }
        Iterator.single(out: InternalRow)
      }
    }
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { cur = it.next(); true } else false
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}

/** The delta write: tasks persist masked positions as dv-sidecar
  * parquet parts and inserted/updated rows as a fresh data group; the
  * driver commit appends both to the manifest — ONE deletion-vector
  * commit for the whole statement. */
private[sources] final class GraftDeltaWrite(
    root: String, dataSchema: StructType, op: String) extends DeltaWrite {

  override def toBatch: DeltaBatchWrite = {
    val spark = SparkSession.active
    def prepared(schema: StructType): (OutputWriterFactory,
        Array[(String, String)]) = {
      val job = Job.getInstance(spark.sessionState.newHadoopConf())
      val factory = ParquetUtils.prepareWrite(spark.sessionState.conf, job,
        schema, new ParquetOptions(Map.empty[String, String],
          spark.sessionState.conf))
      import scala.jdk.CollectionConverters._
      (factory, job.getConfiguration.iterator().asScala
        .map(e => (e.getKey, e.getValue)).toArray)
    }
    val (dataFactory, dataConf) = prepared(dataSchema)
    val maskSchema = GraftDeltaWrite.MaskSchema
    val (maskFactory, maskConf) = prepared(maskSchema)
    val uuid = java.util.UUID.randomUUID().toString
    new GraftDeltaBatchWrite(root, s"data/$uuid", s"_deletes/dv-$uuid",
      dataSchema, dataFactory, dataConf, maskFactory, maskConf, op)
  }
}

private[sources] object GraftDeltaWrite {
  /** Sidecar schema — identical to every other dv sidecar: the op tag
    * feeds CDC classification ('U'pdate | 'D'elete). */
  val MaskSchema: StructType = StructType(Seq(
    StructField(LakeTable.FileCol, StringType, nullable = false),
    StructField(LakeTable.PosCol, LongType, nullable = false),
    StructField("__op", StringType, nullable = false)))
}

private[sources] final class GraftDeltaBatchWrite(
    root: String, dataDir: String, dvRel: String,
    dataSchema: StructType,
    dataFactory: OutputWriterFactory, dataConf: Array[(String, String)],
    maskFactory: OutputWriterFactory, maskConf: Array[(String, String)],
    op: String) extends DeltaBatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DeltaWriterFactory =
    new GraftDeltaWriterFactory(s"$root/$dataDir", s"$root/$dvRel",
      dataSchema, dataFactory, dataConf, maskFactory, maskConf)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val wroteData = messages.collect {
      case GraftDeltaCommitted(d, _) if d => d }.nonEmpty
    val wroteMask = messages.collect {
      case GraftDeltaCommitted(_, m) if m => m }.nonEmpty
    if (!wroteData && !wroteMask) return // no-op statement: no commit
    val v = LakeTable.latestVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"no table at $root"))
    val meta = LakeTable.manifestMetaAt(spark, root, v)
    try {
      if (wroteData) {
        val replacement = spark.read.parquet(s"$root/$dataDir")
        LakeTable.enforceConstraints(spark, root, v, replacement)
        if (LakeTable.uniqueColsAt(meta).nonEmpty) {
          // survivors = masked snapshot minus THIS statement's masks
          val maskDf = spark.read.parquet(s"$root/$dvRel")
            .select(LakeTable.FileCol, LakeTable.PosCol)
          val survivors = LakeTable.readWithLineage(spark, root)
            .join(maskDf, Seq(LakeTable.FileCol, LakeTable.PosCol),
              "left_anti")
            .drop(LakeTable.FileCol, LakeTable.PosCol)
          LakeTable.enforceUnique(meta, replacement, Some(survivors),
            "by delta row-level write")
        }
      }
      val dirs = LakeTable.dataDirsAt(spark, root, v) ++
        (if (wroteData) Seq(dataDir) else Nil)
      val dvMeta =
        if (wroteMask)
          Map("dv" -> (LakeTable.dvState(meta) :+ dvRel).mkString(","))
        else Map.empty[String, String]
      LakeTable.commitVersion(spark, root, v + 1, dirs,
        LakeTable.carryMeta(meta) ++ dvMeta + ("op" -> op))
    } catch { case e: Throwable => abort(messages); throw e }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    Seq(s"$root/$dataDir", s"$root/$dvRel").foreach { p0 =>
      val p = new Path(p0)
      val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (f.exists(p)) f.delete(p, true)
    }
  }
}

private[sources] final case class GraftDeltaCommitted(
    wroteData: Boolean, wroteMask: Boolean) extends WriterCommitMessage

private[sources] final class GraftDeltaWriterFactory(
    absDataDir: String, absDvDir: String, dataSchema: StructType,
    dataFactory: OutputWriterFactory, dataConf: Array[(String, String)],
    maskFactory: OutputWriterFactory, maskConf: Array[(String, String)])
    extends DeltaWriterFactory {

  override def createWriter(partitionId: Int,
                            taskId: Long): DeltaWriter[InternalRow] =
    new DeltaWriter[InternalRow] {
      private def open(factory: OutputWriterFactory,
          conf: Array[(String, String)], dir: String,
          schema: StructType) = {
        val c = new Configuration(false)
        conf.foreach { case (k, v) => c.set(k, v) }
        val ctx = new TaskAttemptContextImpl(c,
          new TaskAttemptID("graftd", 0, TaskType.MAP, partitionId,
            (taskId % Int.MaxValue).toInt))
        val name =
          f"part-$partitionId%05d-$taskId${factory.getFileExtension(ctx)}"
        (factory.newInstance(s"$dir/$name", schema, ctx), s"$dir/$name")
      }
      private lazy val dataW = open(dataFactory, dataConf, absDataDir,
        dataSchema)
      private lazy val maskW = open(maskFactory, maskConf, absDvDir,
        GraftDeltaWrite.MaskSchema)
      private var anyData = false
      private var anyMask = false
      private val tagU = UTF8String.fromString("U")
      private val tagD = UTF8String.fromString("D")

      private def mask(id: InternalRow, tag: UTF8String): Unit = {
        anyMask = true
        val out = new GenericInternalRow(3)
        out.update(0, id.getUTF8String(0).copy())
        out.update(1, id.getLong(1))
        out.update(2, tag)
        maskW._1.write(out)
      }

      override def insert(row: InternalRow): Unit = {
        anyData = true
        dataW._1.write(row)
      }
      override def update(metadata: InternalRow, id: InternalRow,
                          row: InternalRow): Unit = {
        mask(id, tagU)
        insert(row)
      }
      override def delete(metadata: InternalRow, id: InternalRow): Unit =
        mask(id, tagD)

      override def commit(): WriterCommitMessage = {
        if (anyData) dataW._1.close()
        if (anyMask) maskW._1.close()
        GraftDeltaCommitted(anyData, anyMask)
      }
      override def abort(): Unit = {
        def drop(opened: Boolean, w: (org.apache.spark.sql.execution
            .datasources.OutputWriter, String)): Unit = if (opened) {
          w._1.close()
          val p = new Path(w._2)
          val f = p.getFileSystem(new Configuration())
          if (f.exists(p)) f.delete(p, false)
        }
        drop(anyData, dataW); drop(anyMask, maskW)
      }
      override def close(): Unit = ()
    }
}
