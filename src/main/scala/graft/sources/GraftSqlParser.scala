package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** SQL surface for the lake-maintenance verbs Spark's grammar lacks —
  * the statements a Delta user types, routed to the SAME commit
  * protocol the Scala API uses (never a side door):
  *
  *  - `OPTIMIZE <cat>.<t> [MIN BYTES <n>]` →
  *    [[LakeTable.compactSmall]] (default threshold 128 MiB — groups
  *    at or above it are already "right-sized" and never rewritten);
  *  - `OPTIMIZE <cat>.<t> ZORDER BY (a, b) [INTO <n> GROUPS]` →
  *    [[LakeTable.optimizeZOrder]] (whole-table Morton re-layout with
  *    fresh two-column skipping stats);
  *  - `OPTIMIZE <cat>.<t> WHERE <partcol> = <v> [MIN BYTES <n>]` →
  *    [[LakeTable.compactSmallWhere]] (partition-scoped compaction —
  *    only the named value's groups are touched);
  *  - `VACUUM <cat>.<t> RETAIN <n> VERSIONS` → [[LakeTable.vacuum]];
  *    `VACUUM <cat>.<t> RETAIN <n> HOURS` →
  *    [[LakeTable.vacuumRetainHours]] (Delta's time-based retention —
  *    commit mtimes decide, the latest version always survives).
  *    RETAIN is REQUIRED either way: a default would silently destroy
  *    time travel, the one thing a vacuum must never do by surprise;
  *  - `DESCRIBE HISTORY <cat>.<t>` → [[LakeTable.historyWithTimestamps]]
  *    rows (version, operation, file_groups, commit_ts), ascending —
  *    commit_ts is the manifest mtime, the same clock `TIMESTAMP AS
  *    OF` and `RETAIN n HOURS` read, so listed times round-trip;
  *  - `RESTORE [TABLE] <cat>.<t> [TO] VERSION AS OF <n>` →
  *    [[LakeTable.restore]] (a NEW commit re-referencing the old
  *    version's groups — history stays immutable);
  *    `RESTORE [TABLE] <cat>.<t> [TO] TIMESTAMP AS OF '<ts>'` — same,
  *    target resolved by commit time ([[LakeTable.versionAtTimestamp]]);
  *  - `CREATE TABLE <cat>.<t2> SHALLOW CLONE <cat>.<t1>` →
  *    [[LakeTable.shallowClone]] (zero-copy fork by reference);
  *  - `DESCRIBE DETAIL <cat>.<t>` → the one-row table summary
  *    (format/location/version/groups/bytes/partitioning/constraints);
  *  - `CONVERT TO LAKE <cat>.<t> FROM '<parquetDir>'` →
  *    [[LakeTable.convertInPlace]] (zero-copy: v1 references the
  *    existing directory by absolute path; the bytes stay foreign —
  *    this table's vacuum never deletes them);
  *  - `COPY INTO <cat>.<t> FROM '<dir>' FILEFORMAT = PARQUET
  *    [PATTERN = '<glob>'] [COPY_OPTIONS ('force' = 'true')]` →
  *    [[LakeTable.copyInto]] (idempotent file-level bulk ingest:
  *    loaded files skip by ledger, nothing-new is a no-op commit-wise,
  *    a mutated already-loaded file refuses unless forced);
  *  - `UPDATE <cat>.<t> SET a = e1, … [WHERE cond]` and
  *    `DELETE FROM <cat>.<t> [WHERE cond]` — ONLY under
  *    `spark.graft.update.mode=mor` — route to the deletion-vector
  *    merge-on-read paths ([[LakeTable.updateWhereMor]] /
  *    [[LakeTable.deleteWhereDv]]: O(matches) bytes, groups
  *    untouched); default mode delegates to Spark's copy-on-write
  *    row-level plans unchanged;
  *  - `INSERT INTO <cat>.<t> REPLACE WHERE <cond> <query>` → the DSv2
  *    overwrite path ([[GraftLakeTable.filtersToBand]]): the condition
  *    must reduce to a single-column band or the write refuses loudly.
  *    Parsed by splitting at the first SELECT/VALUES/WITH/TABLE/FROM
  *    keyword — a condition containing one of those words as an
  *    identifier is out of scope (delegate a `writeTo(...).overwrite`
  *    instead).
  *
  * Everything else delegates verbatim to the session parser, so the
  * extension is a pure superset of Spark SQL. Install via
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.intercept(sqlText, delegate)
      .getOrElse(delegate.parsePlan(sqlText))
  // the interface DEFAULT for the parameterized entry point discards
  // the parameter context (it falls back to plain parsePlan), which
  // unbinds every `:name` / `?` parameter in spark.sql(text, args) —
  // delegate it explicitly so parameterized SQL keeps working
  override def parsePlanWithParameters(sqlText: String,
      ctx: org.apache.spark.sql.catalyst.parser.ParameterContext)
      : LogicalPlan =
    GraftSqlParser.intercept(sqlText, delegate)
      .getOrElse(delegate.parsePlanWithParameters(sqlText, ctx))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String)
      : org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {
  private val OptimizeRe =
    """(?is)^\s*OPTIMIZE\s+([\w`]+(?:\.[\w`]+)+)(?:\s+MIN\s+BYTES\s+(\d+))?\s*;?\s*$""".r
  // one or more `<col> = <value>` pins joined by AND
  private val PinsPat =
    """[\w`]+\s*=\s*(?:'[^']*'|[\w.\-]+)(?:\s+AND\s+[\w`]+\s*=\s*(?:'[^']*'|[\w.\-]+))*"""
  private val OptimizeWhereRe =
    ("""(?is)^\s*OPTIMIZE\s+([\w`]+(?:\.[\w`]+)+)\s+WHERE\s+(""" +
      PinsPat + """)(?:\s+MIN\s+BYTES\s+(\d+))?\s*;?\s*$""").r
  private val PinRe =
    """(?is)^\s*([\w`]+)\s*=\s*(?:'([^']*)'|([\w.\-]+))\s*$""".r

  /** Parse `a = x AND b = y …` into (column, value) pins — split at
    * TOP-LEVEL `AND` only (an `AND` inside a quoted value belongs to
    * the value, same scanner the UPDATE verb uses). */
  private def parsePins(s0: String): Seq[(String, String)] = {
    def split(s: String): Seq[String] = findTopLevel(s, "AND") match {
      case -1 => Seq(s)
      case i => s.substring(0, i) +: split(s.substring(i + 3))
    }
    split(s0).map(_.trim).map {
      case PinRe(c, qv, bv) =>
        (c.stripPrefix("`").stripSuffix("`"), Option(qv).getOrElse(bv))
      case other => throw new IllegalArgumentException(
        s"OPTIMIZE … WHERE: cannot parse pin '$other' — expected " +
          "<partition column> = <value>")
    }
  }
  private val ZOrderRe =
    """(?is)^\s*OPTIMIZE\s+([\w`]+(?:\.[\w`]+)+)\s+ZORDER\s+BY\s*\(\s*([\w`]+(?:\s*,\s*[\w`]+){1,3})\s*\)(?:\s+INTO\s+(\d+)\s+GROUPS)?(\s+INCREMENTAL)?\s*;?\s*$""".r
  private lazy val ZOrderWhereRe =
    ("""(?is)^\s*OPTIMIZE\s+([\w`]+(?:\.[\w`]+)+)\s+WHERE\s+(""" +
      PinsPat +
      """)\s+ZORDER\s+BY\s*\(\s*([\w`]+(?:\s*,\s*[\w`]+){1,3})\s*\)(?:\s+INTO\s+(\d+)\s+GROUPS)?\s*;?\s*$""").r

  private def zcols(list: String): Seq[String] =
    list.split(",").toSeq.map(_.trim.stripPrefix("`").stripSuffix("`"))
  private val VacuumRe =
    """(?is)^\s*VACUUM\s+([\w`]+(?:\.[\w`]+)+)\s+RETAIN\s+(\d+)\s+VERSIONS(\s+DRY\s+RUN)?\s*;?\s*$""".r
  private val VacuumHoursRe =
    """(?is)^\s*VACUUM\s+([\w`]+(?:\.[\w`]+)+)\s+RETAIN\s+(\d+)\s+HOURS(\s+DRY\s+RUN)?\s*;?\s*$""".r
  private val RestoreTsRe =
    """(?is)^\s*RESTORE\s+(?:TABLE\s+)?([\w`]+(?:\.[\w`]+)+)\s+(?:TO\s+)?TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*;?\s*$""".r
  private val ConvertRe =
    """(?is)^\s*CONVERT\s+TO\s+LAKE\s+([\w`]+(?:\.[\w`]+)+)\s+FROM\s+'([^']+)'\s*;?\s*$""".r
  // everything after SET is captured whole; the SET/WHERE boundary is
  // found by the quote/paren-aware scanner (splitTopLevelWhere) — a
  // regex split at the first " WHERE " would mis-split on the token
  // inside a string literal or a parenthesized subexpression
  private val UpdateRe =
    """(?is)^\s*UPDATE\s+([\w`]+(?:\.[\w`]+)+)\s+SET\s+(.+?)\s*;?\s*$""".r
  private val DeleteRe =
    """(?is)^\s*DELETE\s+FROM\s+([\w`]+(?:\.[\w`]+)+)(?:\s+WHERE\s+(.+?))?\s*;?\s*$""".r
  // MERGE INTO <cat>.<t> [[AS] alias] USING <rest> — the USING/ON/WHEN
  // boundaries are found by the top-level scanner, not the regex (a
  // subquery source may contain ON/WHEN tokens of its own)
  private val MergeIntoRe =
    """(?is)^\s*MERGE\s+INTO\s+([\w`]+(?:\.[\w`]+)+)(?:\s+(?:AS\s+)?([A-Za-z_]\w*))?\s+USING\s+(.+?)\s*;?\s*$""".r
  // ON <one equality on the same-named key column of both sides>
  private val OnEqRe =
    """(?is)^\s*(?:([\w`]+)\s*\.\s*)?([\w`]+)\s*=\s*(?:([\w`]+)\s*\.\s*)?([\w`]+)\s*$""".r
  private val VacuumBareRe =
    """(?is)^\s*VACUUM\s+([\w`]+(?:\.[\w`]+)+)\s*;?\s*$""".r
  private val HistoryRe =
    """(?is)^\s*DESCRIBE\s+HISTORY\s+([\w`]+(?:\.[\w`]+)+)\s*;?\s*$""".r
  private val RestoreRe =
    """(?is)^\s*RESTORE\s+(?:TABLE\s+)?([\w`]+(?:\.[\w`]+)+)\s+(?:TO\s+)?VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*$""".r
  private val ReplaceWhereRe =
    """(?is)^\s*INSERT\s+INTO\s+([\w`]+(?:\.[\w`]+)+)\s+REPLACE\s+WHERE\s+(.+?)\s+((?:SELECT|VALUES|WITH|TABLE|FROM)\b.*)$""".r
  private val CloneRe =
    """(?is)^\s*CREATE\s+TABLE\s+([\w`]+(?:\.[\w`]+)+)\s+SHALLOW\s+CLONE\s+([\w`]+(?:\.[\w`]+)+)\s*;?\s*$""".r
  private val DetailRe =
    """(?is)^\s*DESCRIBE\s+DETAIL\s+([\w`]+(?:\.[\w`]+)+)\s*;?\s*$""".r
  private val CopyIntoRe =
    """(?is)^\s*COPY\s+INTO\s+([\w`]+(?:\.[\w`]+)+)\s+FROM\s+'([^']+)'\s+FILEFORMAT\s*=\s*(\w+)(?:\s+PATTERN\s*=\s*'([^']+)')?(?:\s+COPY_OPTIONS\s*\(\s*'force'\s*=\s*'(\w+)'\s*\))?\s*;?\s*$""".r

  private def parts(ident: String): Seq[String] =
    ident.split("\\.").toSeq.map(_.stripPrefix("`").stripSuffix("`"))

  private[sources] def intercept(
      sqlText: String, delegate: ParserInterface): Option[LogicalPlan] =
    sqlText match {
      case ZOrderRe(t, colList, n, incr) =>
        Some(GraftZOrderCommand(parts(t), zcols(colList),
          Option(n).map(_.toInt).getOrElse(
            if (incr != null) 8 else 64),
          incremental = incr != null))
      case ZOrderWhereRe(t, pinsStr, colList, n) =>
        Some(GraftZOrderWhereCommand(parts(t), parsePins(pinsStr),
          zcols(colList), Option(n).map(_.toInt).getOrElse(8)))
      case OptimizeWhereRe(t, pinsStr, min) =>
        Some(GraftOptimizeWhereCommand(parts(t), parsePins(pinsStr),
          Option(min).map(_.toLong).getOrElse(128L * 1024 * 1024)))
      case OptimizeRe(t, min) =>
        Some(GraftMaintenanceCommand("optimize", parts(t),
          Option(min).map(_.toLong).orElse(Some(128L * 1024 * 1024))))
      case VacuumRe(t, n, dry) =>
        if (dry == null)
          Some(GraftMaintenanceCommand("vacuum", parts(t), Some(n.toLong)))
        else Some(GraftVacuumDryRunCommand(parts(t), n.toLong,
          hours = false))
      case VacuumHoursRe(t, n, dry) =>
        if (dry == null)
          Some(GraftMaintenanceCommand("vacuum-hours", parts(t),
            Some(n.toLong)))
        else Some(GraftVacuumDryRunCommand(parts(t), n.toLong,
          hours = true))
      case RestoreTsRe(t, ts) =>
        Some(GraftRestoreTimestampCommand(parts(t), ts))
      case ConvertRe(t, dir) =>
        Some(GraftConvertCommand(parts(t), dir))
      // SQL UPDATE routes to the deletion-vector merge-on-read path
      // ONLY when the session opted in (spark.graft.update.mode=mor)
      // AND the target is a graft-lake catalog table — everything else
      // delegates to Spark's plan (the copy-on-write row-level op).
      case UpdateRe(t, rest) if morUpdateTarget(t) =>
        val (sets, where) = splitTopLevelWhere(rest)
        Some(GraftMorUpdateCommand(parts(t),
          splitAssignments(sets, parts(t).lastOption), where))
      case DeleteRe(t, where) if morUpdateTarget(t) =>
        Some(GraftMorDeleteCommand(parts(t), Option(where)))
      // SQL MERGE routes to the deletion-vector merge-on-read upsert
      // ([[LakeTable.mergeMor]]) ONLY for the canonical whole-row
      // upsert shape — WHEN MATCHED THEN UPDATE SET * / WHEN NOT
      // MATCHED THEN INSERT * (Delta's dominant MERGE) — under
      // spark.graft.update.mode=mor against a graft-lake catalog
      // table. Any other clause form falls through to Spark's
      // row-level plan (the copy-on-write MERGE, q155/q156), which is
      // semantically identical and refuses on a dv snapshot until
      // rewrite — never a silent wrong answer.
      case MergeIntoRe(t, _, rest) if morUpdateTarget(t) &&
          morMergeShape(rest).isDefined =>
        val (usingSql, key) = morMergeShape(rest).get
        Some(GraftMorMergeCommand(parts(t), usingSql, key))
      case VacuumBareRe(t) =>
        throw new IllegalArgumentException(
          s"VACUUM $t requires an explicit RETAIN <n> VERSIONS or " +
            "RETAIN <n> HOURS clause — a default retention would " +
            "silently truncate time travel")
      case HistoryRe(t) =>
        Some(GraftMaintenanceCommand("history", parts(t), None))
      case CloneRe(dst, src) =>
        Some(GraftCloneCommand(parts(dst), parts(src)))
      case DetailRe(t) =>
        Some(GraftDescribeDetailCommand(parts(t)))
      case CopyIntoRe(t, path, fmt, pat, force) =>
        require(fmt.equalsIgnoreCase("PARQUET"),
          s"COPY INTO supports FILEFORMAT = PARQUET only, got '$fmt'")
        val forced = Option(force) match {
          case None => false
          case Some(v) if v.equalsIgnoreCase("true") => true
          case Some(v) if v.equalsIgnoreCase("false") => false
          case Some(v) => throw new IllegalArgumentException(
            s"COPY_OPTIONS 'force' must be 'true' or 'false', got '$v'")
        }
        Some(GraftCopyIntoCommand(parts(t), path, Option(pat), forced))
      case RestoreRe(t, v) =>
        Some(GraftMaintenanceCommand("restore", parts(t), Some(v.toLong)))
      case ReplaceWhereRe(t, cond, query) =>
        import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
        import org.apache.spark.sql.catalyst.plans.logical.OverwriteByExpression
        Some(OverwriteByExpression.byPosition(
          UnresolvedRelation(parts(t)),
          delegate.parseQuery(query),
          delegate.parseExpression(cond)))
      case _ => None
    }

  /** True when the session opted SQL UPDATE into the merge-on-read
    * deletion-vector path AND `ident` names a graft-lake catalog
    * table. Checked at PARSE time so a non-graft UPDATE (or a session
    * in the default copy-on-write mode) delegates to Spark's plan
    * untouched. */
  private def morUpdateTarget(ident: String): Boolean = {
    val spark = SparkSession.active
    spark.conf.getOption("spark.graft.update.mode").contains("mor") &&
      (parts(ident) match {
        case Seq(cat, _) =>
          spark.conf.getOption(s"spark.sql.catalog.$cat")
            .contains("graft.sources.GraftLakeCatalog")
        case _ => false
      })
  }

  /** Index of the first TOP-LEVEL occurrence of keyword `kw` — outside
    * single-quoted strings, backtick identifiers, and parens, bounded
    * by non-word chars — in `rest`; -1 when absent. */
  private def findTopLevel(rest: String, kw: String): Int = {
    var depth = 0; var inStr = false; var inTick = false
    var i = 0
    val n = rest.length
    val k = kw.length
    def wordChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'
    while (i < n) {
      val ch = rest.charAt(i)
      // inside a string literal a backslash escapes the next char
      // (Spark's '\'' escape) — without tracking it, an escaped quote
      // would close the literal and an embedded keyword mis-split
      if (inStr) {
        if (ch == '\\') i += 1 else if (ch == '\'') inStr = false
      }
      else if (inTick) { if (ch == '`') inTick = false }
      else ch match {
        case '\'' => inStr = true
        case '`'  => inTick = true
        case '('  => depth += 1
        case ')'  => depth -= 1
        case c if depth == 0 &&
            (c == kw.charAt(0) || c.toUpper == kw.charAt(0).toUpper) &&
            i + k <= n && rest.substring(i, i + k).equalsIgnoreCase(kw) &&
            (i == 0 || !wordChar(rest.charAt(i - 1))) &&
            (i + k == n || !wordChar(rest.charAt(i + k))) =>
          return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  /** Split the text following `SET` at the first top-level `WHERE`
    * keyword into (setsSql, whereSqlOpt). A `WHERE` inside a string
    * literal or a parenthesized subexpression belongs to a SET
    * expression and is never the clause boundary. */
  private[sources] def splitTopLevelWhere(
      rest: String): (String, Option[String]) =
    findTopLevel(rest, "WHERE") match {
      case -1 => (rest.trim, None)
      case i => (rest.substring(0, i).trim,
        Some(rest.substring(i + 5).trim).filter(_.nonEmpty))
    }

  /** Split `a = e1, b = e2, …` at top-level commas (commas inside
    * parens, single-quoted strings, or backticks belong to the
    * expressions) into (column, expressionSql) pairs. A column may be
    * qualified by the target TABLE's name (`SET t.col = …` — plain
    * Spark accepts it); any other qualifier refuses by name. */
  private[sources] def splitAssignments(
      sets: String, table: Option[String] = None): Seq[(String, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0; var inStr = false; var inTick = false; var esc = false
    sets.foreach { ch =>
      if (inStr) {
        cur += ch
        if (esc) esc = false
        else if (ch == '\\') esc = true
        else if (ch == '\'') inStr = false
      }
      else if (inTick) { cur += ch; if (ch == '`') inTick = false }
      else ch match {
        case '\'' => inStr = true; cur += ch
        case '`'  => inTick = true; cur += ch
        case '(' => depth += 1; cur += ch
        case ')' => depth -= 1; cur += ch
        case ',' if depth == 0 => out += cur.toString; cur.clear()
        case c => cur += c
      }
    }
    if (cur.nonEmpty) out += cur.toString
    val AssignRe = """(?s)^\s*((?:`[^`]*`|[\w]+)(?:\s*\.\s*(?:`[^`]*`|[\w]+))?)\s*=(.+)$""".r
    out.toSeq.map {
      case AssignRe(c, e) =>
        // split the target on dots OUTSIDE backticks only — a backticked
        // column literally named `a.b` is one segment, not a qualifier
        val segs = splitQualifiedTarget(c)
        val colName = segs match {
          case Seq(one) => one
          case Seq(q, col2) =>
            require(table.exists(_.equalsIgnoreCase(q)),
              s"UPDATE … SET: assignment qualifier '$q' does not name " +
                s"the target table${table.fold("")(t => s" '$t'")}")
            col2
          case _ => throw new IllegalArgumentException(
            s"UPDATE … SET: cannot parse assignment target '$c'")
        }
        (colName, e.trim)
      case other => throw new IllegalArgumentException(
        s"UPDATE … SET: cannot parse assignment '$other' — expected " +
          "<column> = <expression>")
    }
  }

  /** Split an assignment target on '.' OUTSIDE backticks, stripping the
    * backticks as it goes — `` `a.b` `` is ONE segment (a column whose
    * name contains a dot), `t.col` and `` t.`col` `` are two. */
  private def splitQualifiedTarget(c: String): Seq[String] = {
    val segs = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inTick = false
    c.foreach {
      case '`' => inTick = !inTick
      case '.' if !inTick => segs += cur.toString.trim; cur.clear()
      case ch => cur += ch
    }
    segs += cur.toString.trim
    segs.toSeq
  }

  /** The (usingSql, keyColumn) of a MERGE tail (`<source> ON <cond>
    * WHEN …`) when — and only when — it is the canonical whole-row
    * upsert: ON is a single equality on the same-named column of both
    * sides, and the WHEN clauses are exactly
    * `WHEN MATCHED THEN UPDATE SET *` + `WHEN NOT MATCHED THEN INSERT
    * *` (either order). Anything else returns None and the statement
    * delegates to Spark's row-level MERGE plan. */
  private def morMergeShape(rest: String): Option[(String, String)] = {
    val onIdx = findTopLevel(rest, "ON")
    if (onIdx < 0) return None
    val usingSql = rest.substring(0, onIdx).trim
    val afterOn = rest.substring(onIdx + 2)
    val whenIdx = findTopLevel(afterOn, "WHEN")
    if (whenIdx < 0) return None
    val onSql = afterOn.substring(0, whenIdx).trim
    val whenSql = afterOn.substring(whenIdx).trim
    def bare(s: String) = s.stripPrefix("`").stripSuffix("`")
    val key = onSql match {
      case OnEqRe(_, l, _, r) if bare(l).equalsIgnoreCase(bare(r)) =>
        bare(l)
      case _ => return None
    }
    val norm = whenSql.replaceAll("\\s+", " ").toLowerCase
    val canonical =
      norm == "when matched then update set * " +
        "when not matched then insert *" ||
      norm == "when not matched then insert * " +
        "when matched then update set *"
    if (canonical && usingSql.nonEmpty) Some((usingSql, key)) else None
  }

  /** Resolve `<catalog>.<table>` to the table's filesystem root through
    * the registered [[GraftLakeCatalog]] config — maintenance verbs are
    * lake-specific, so a non-graft catalog refuses up front. */
  private[sources] def rootFor(spark: SparkSession,
                               nameParts: Seq[String]): String =
    nameParts match {
      case Seq(cat, name) =>
        val cls = spark.conf.getOption(s"spark.sql.catalog.$cat")
        require(cls.contains("graft.sources.GraftLakeCatalog"),
          s"'$cat' is not a graft-lake catalog (maintenance statements " +
            "apply to graft-lake tables only)")
        val wh = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
        new org.apache.hadoop.fs.Path(wh, name).toString
      case other => throw new IllegalArgumentException(
        "maintenance statements need a <catalog>.<table> name, got " +
          other.mkString("."))
    }
}

/** SQL table-valued functions over the lake surface, registered via
  * `SparkSessionExtensions.injectTableFunction`
  * ([[graft.functions.GraftExtensions]]). */
object GraftTableFunctions {

  /** `table_changes('<catalog>.<table>', fromVersion, toVersion,
    * '<keyColumn>')` — Delta's CDC TVF over [[LakeTable.changes]]:
    * rows tagged insert / update_preimage / update_postimage / delete
    * in `_change_type`, diffed between the two committed versions.
    * The key column is EXPLICIT (4th argument) because the feed is a
    * snapshot diff, not a stored change log — update pairing needs the
    * row identity; Delta stores change files and can omit it. All four
    * arguments must be literals (the table resolves at analysis time).
    * Scale: the diff reads only file groups NOT shared by the two
    * manifests — churn-bounded, never table-bounded. */
  def tableChanges(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.length == 4,
      "table_changes(table, fromVersion, toVersion, keyColumn) takes " +
        s"exactly 4 arguments, got ${exprs.length}")
    def lit(e: Expression, what: String): Any = {
      require(e.foldable, s"table_changes: $what must be a literal")
      e.eval()
    }
    def str(e: Expression, what: String): String = lit(e, what) match {
      case u: org.apache.spark.unsafe.types.UTF8String => u.toString
      case other => throw new IllegalArgumentException(
        s"table_changes: $what must be a string literal, got $other")
    }
    def int(e: Expression, what: String): Int = lit(e, what) match {
      case n: java.lang.Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"table_changes: $what must be an integer literal, got $other")
    }
    val spark = SparkSession.active
    val root = GraftSqlParser.rootFor(spark,
      str(exprs(0), "table").split("\\.").toSeq
        .map(_.stripPrefix("`").stripSuffix("`")))
    LakeTable.changes(spark, root,
      int(exprs(1), "fromVersion"), int(exprs(2), "toVersion"),
      str(exprs(3), "keyColumn")).queryExecution.analyzed
  }
}

/** `OPTIMIZE t ZORDER BY (a, b) [INTO n GROUPS] [INCREMENTAL]` — the
  * multi-dimensional layout rewrite ([[LakeTable.optimizeZOrder]]):
  * contiguous Morton ranges are rectangles in (a, b) space, so range
  * probes on either column prune at the manifest level. INCREMENTAL
  * clusters only groups created since the last clustering commit
  * ([[LakeTable.optimizeZOrderIncremental]] — liquid-style, O(new
  * data) per run). */
case class GraftZOrderCommand(nameParts: Seq[String], cols: Seq[String],
                              numGroups: Int,
                              incremental: Boolean = false)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftSqlParser.rootFor(spark, nameParts)
    Seq(Row((if (incremental)
      LakeTable.optimizeZOrderIncremental(spark, root, cols, numGroups)
    else LakeTable.optimizeZOrder(spark, root, cols, numGroups)).toLong))
  }
}

/** `CREATE TABLE dst SHALLOW CLONE src` — Delta's zero-copy fork:
  * the clone's v1 re-references the source's file groups by absolute
  * path ([[LakeTable.shallowClone]] — foreign bytes are NEVER deleted
  * by the clone's vacuum; only the owning table may). Both tables
  * must live in graft-lake catalogs; they may differ. */
case class GraftCloneCommand(dst: Seq[String], src: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(LakeTable.shallowClone(spark,
      GraftSqlParser.rootFor(spark, src),
      GraftSqlParser.rootFor(spark, dst)).toLong))
}

/** `DESCRIBE DETAIL t` — Delta's one-row table summary: format,
  * location, latest version, file-group count, total data bytes,
  * partition columns, and the committed constraint count. Manifest +
  * one file listing; zero data bytes read. */
case class GraftDescribeDetailCommand(nameParts: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("format", StringType, nullable = false)(),
    AttributeReference("location", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("num_file_groups", LongType, nullable = false)(),
    AttributeReference("size_bytes", LongType, nullable = false)(),
    AttributeReference("partition_columns", StringType, nullable = false)(),
    AttributeReference("num_constraints", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftSqlParser.rootFor(spark, nameParts)
    val v = LakeTable.latestVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"no table at $root"))
    val meta = LakeTable.manifestMetaAt(spark, root, v)
    val dirs = LakeTable.dataDirPaths(spark, root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = dirs.map { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      fs.getContentSummary(p).getLength
    }.sum
    val nConstraints = meta.keys.count(k =>
      k.startsWith("check:") || k.startsWith("unique:")).toLong
    Seq(Row("graft-lake", root, v.toLong, dirs.size.toLong, bytes,
      LakeTable.partColsAt(meta).mkString(","), nConstraints))
  }
}

/** `COPY INTO t FROM '<dir>' FILEFORMAT = PARQUET [PATTERN = '<glob>']
  * [COPY_OPTIONS ('force' = 'true')]` — Databricks' idempotent bulk
  * ingest ([[LakeTable.copyInto]]): already-loaded files skip by
  * ledger, nothing-new is a true no-op (the version does not move), a
  * previously-loaded file that mutated (size or mtime) refuses unless
  * forced,
  * and new files land through the SAME validated append path as every
  * other write. */
case class GraftCopyIntoCommand(nameParts: Seq[String], srcDir: String,
                                pattern: Option[String], force: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("num_loaded_files", LongType, nullable = false)(),
    AttributeReference("num_skipped_files", LongType, nullable = false)(),
    AttributeReference("num_inserted_rows", LongType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val (loaded, skipped, rows, v) = LakeTable.copyInto(spark,
      GraftSqlParser.rootFor(spark, nameParts), srcDir, pattern, force)
    Seq(Row(loaded, skipped, rows, v.toLong))
  }
}

/** `RESTORE [TABLE] t [TO] TIMESTAMP AS OF '<ts>'` — Delta's
  * timestamp restore: the target resolves to the newest version
  * committed at or before the timestamp ([[LakeTable.versionAtTimestamp]],
  * manifest mtimes), then restores exactly like `VERSION AS OF`. The
  * literal accepts `yyyy-MM-dd[ HH:mm:ss[.fff]]` in the JVM-local
  * zone — the same round trip `java.sql.Timestamp.toString` produces. */
case class GraftRestoreTimestampCommand(nameParts: Seq[String], ts: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("restored_version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftSqlParser.rootFor(spark, nameParts)
    val millis = LakeTable.parseTsLiteralMillis(ts)
    val target = LakeTable.versionAtTimestamp(spark, root,
      Math.multiplyExact(millis, 1000L))
    Seq(Row(LakeTable.restore(spark, root, target).toLong, target.toLong))
  }
}

/** `CONVERT TO LAKE <cat>.<t> FROM '<parquetDir>'` — Delta's
  * CONVERT TO DELTA: version 1 references the existing parquet
  * directory by absolute path, zero bytes copied
  * ([[LakeTable.convertInPlace]]). */
case class GraftConvertCommand(nameParts: Seq[String], srcDir: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(LakeTable.convertInPlace(spark,
      GraftSqlParser.rootFor(spark, nameParts), srcDir).toLong))
}

/** `OPTIMIZE t WHERE <partcol> = <v> [AND <partcol2> = <v2> …] ZORDER
  * BY (a, b[, c, d]) [INTO n GROUPS]` — partition-scoped Morton
  * re-layout ([[LakeTable.optimizeZOrderWhereTuple]]): only the pinned
  * tuple's groups rewrite (as z-range groups still tagged with the
  * tuple); every other partition carries by name, zero bytes read. The
  * pins must cover the FULL partition tuple (partial pins refuse — a
  * merge across tuples would break one-value-per-group pruning). */
case class GraftZOrderWhereCommand(nameParts: Seq[String],
    pins: Seq[(String, String)], cols: Seq[String], numGroups: Int)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(LakeTable.optimizeZOrderWhereTuple(spark,
      GraftSqlParser.rootFor(spark, nameParts), pins, cols,
      numGroups).toLong))
}

/** `OPTIMIZE t WHERE <partcol> = <v> [AND <partcol2> = <v2> …]
  * [MIN BYTES n]` — partition-scoped compaction
  * ([[LakeTable.compactSmallWhereTuple]]): only groups matching EVERY
  * pin merge (within one value tuple, as always); everything else is
  * carried by name, zero bytes read. Refuses on non-partition
  * columns; a partial pin is fine here (unlike the scoped ZORDER). */
case class GraftOptimizeWhereCommand(nameParts: Seq[String],
    pins: Seq[(String, String)], minBytes: Long)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(LakeTable.compactSmallWhereTuple(spark,
      GraftSqlParser.rootFor(spark, nameParts), pins,
      minBytes).toLong))
}

/** SQL `UPDATE` on the merge-on-read deletion-vector path
  * ([[LakeTable.updateWhereMor]]) — active only under
  * `spark.graft.update.mode=mor`: a point update costs O(matches)
  * bytes (positional delete sidecar + replacement rows, existing
  * groups untouched on disk) instead of the default copy-on-write
  * group rewrite. SET expressions and the WHERE condition are kept as
  * SQL text and parsed by the session parser at RUN time, so they may
  * reference any column with full Spark SQL syntax; all update gates
  * (identity/generated refusals, CHECK/UNIQUE, partition routing)
  * apply identically to the API path. Returns the committed version. */
case class GraftMorUpdateCommand(nameParts: Seq[String],
    setPairs: Seq[(String, String)], where: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftSqlParser.rootFor(spark, nameParts)
    val parser = spark.sessionState.sqlParser
    def toCol(sql: String) = org.apache.spark.sql.graftbridge
      .ColumnBridge.column(parser.parseExpression(sql))
    val cond = where.map(toCol).getOrElse(
      org.apache.spark.sql.functions.lit(true))
    val sets = setPairs.map { case (c, e) => c -> toCol(e) }.toMap
    Seq(Row(LakeTable.updateWhereMor(spark, root, cond, sets).toLong))
  }
}

/** SQL `MERGE INTO … WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED
  * THEN INSERT *` on the merge-on-read deletion-vector path
  * ([[LakeTable.mergeMor]]) — active only under
  * `spark.graft.update.mode=mor`: matched keys mask positionally
  * (O(matches) sidecar), ALL source rows land as ONE fresh group,
  * every pre-existing data file stays byte-identical. `SET *`/`INSERT
  * *` is a whole-row upsert, so the source must carry exactly the
  * target's columns (any order — aligned here); a shape mismatch
  * refuses loudly before any byte lands. The source text re-parses at
  * RUN time (`SELECT * FROM <using>`), so table names, time-travel
  * clauses, and parenthesized subqueries all work. */
case class GraftMorMergeCommand(nameParts: Seq[String],
    usingSql: String, key: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftSqlParser.rootFor(spark, nameParts)
    val src = spark.sql(s"SELECT * FROM $usingSql")
    val tCols = LakeTable.read(spark, root).columns
    require(tCols.map(_.toLowerCase).sorted.toSeq ==
        src.columns.map(_.toLowerCase).sorted.toSeq,
      "MERGE … UPDATE SET * / INSERT * needs the source to carry " +
        s"exactly the target's columns (${tCols.mkString(", ")}), " +
        s"got ${src.columns.mkString(", ")}")
    val aligned = src.select(tCols.toIndexedSeq.map(
      org.apache.spark.sql.functions.col): _*)
    Seq(Row(LakeTable.mergeMor(spark, root, aligned, key).toLong))
  }
}

/** `VACUUM t RETAIN n VERSIONS|HOURS DRY RUN` — Delta's pre-flight:
  * lists every path the real vacuum would delete (stale data dirs,
  * dropped change sidecars, dropped manifests), deleting NOTHING. The
  * real vacuum deletes exactly this list. */
case class GraftVacuumDryRunCommand(nameParts: Seq[String], n: Long,
    hours: Boolean) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftSqlParser.rootFor(spark, nameParts)
    val keep =
      if (hours) LakeTable.retainHoursKeepCount(spark, root, n)
      else { require(n >= 1, "RETAIN must keep at least 1 version")
        n.toInt }
    LakeTable.vacuumDryRun(spark, root, keep).map(Row(_))
  }
}

/** SQL `DELETE` on the positional deletion-vector path
  * ([[LakeTable.deleteWhereDv]]) — active only under
  * `spark.graft.update.mode=mor`: any predicate, no key column, one
  * O(matches) sidecar commit, data files untouched. Default mode
  * delegates to Spark's copy-on-write plan unchanged. */
case class GraftMorDeleteCommand(nameParts: Seq[String],
    where: Option[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftSqlParser.rootFor(spark, nameParts)
    val cond = where.map(w => org.apache.spark.sql.graftbridge
        .ColumnBridge.column(spark.sessionState.sqlParser
          .parseExpression(w)))
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    Seq(Row(LakeTable.deleteWhereDv(spark, root, cond).toLong))
  }
}

/** Eagerly-executed maintenance verb. Each run routes to the LakeTable
  * API, so SQL and Scala maintenance are the same commits (same
  * conflict rules, same retention safety). */
case class GraftMaintenanceCommand(verb: String, nameParts: Seq[String],
                                   n: Option[Long])
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = verb match {
    case "history" => Seq(
      AttributeReference("version", LongType, nullable = false)(),
      AttributeReference("operation", StringType, nullable = false)(),
      AttributeReference("file_groups", LongType, nullable = false)(),
      AttributeReference("commit_ts",
        org.apache.spark.sql.types.TimestampType, nullable = false)())
    case _ => Seq(
      AttributeReference("version", LongType, nullable = false)())
  }

  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftSqlParser.rootFor(spark, nameParts)
    verb match {
      case "optimize" =>
        Seq(Row(LakeTable.compactSmall(spark, root, n.get).toLong))
      case "vacuum" =>
        require(n.get >= 1, "RETAIN must keep at least 1 version")
        LakeTable.vacuum(spark, root, n.get.toInt)
        Seq(Row(LakeTable.versions(spark, root).last.toLong))
      case "vacuum-hours" =>
        LakeTable.vacuumRetainHours(spark, root, n.get)
        Seq(Row(LakeTable.versions(spark, root).last.toLong))
      case "history" =>
        // commit_ts = manifest mtime, the same clock TIMESTAMP AS OF
        // and RETAIN n HOURS read — a listed time round-trips exactly
        LakeTable.historyWithTimestamps(spark, root).map {
          case (v, op, g, ms) =>
            Row(v.toLong, op, g.toLong, new java.sql.Timestamp(ms)) }
      case "restore" =>
        Seq(Row(LakeTable.restore(spark, root, n.get.toInt).toLong))
      case other =>
        throw new IllegalStateException(s"unknown maintenance verb $other")
    }
  }
}
