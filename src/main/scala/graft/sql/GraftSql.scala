package graft.sql

import graft.delta._
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions.{And => CAnd, Cast, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal, Not, Or => COr}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.util.matching.Regex

/** SQL-string command surface over graft Delta tables — the interface a
  * SQL-first user expects for the maintenance/DML semantics that already
  * exist behind the Scala APIs (reference users drive delta-rs through
  * Python; a Spark user types SQL).
  *
  * `GraftSql.sql(spark, stmt)` recognizes the Delta command statements
  * below against path-addressed tables (``delta.`/path` ``,
  * ``graft.`/path` ``, a quoted path, or a bare path) and dispatches to
  * the corresponding engine API; anything else falls through to
  * `spark.sql` untouched, so the full Spark SELECT surface keeps
  * working through the same entry point.
  *
  *   - DELETE FROM t [WHERE p]            (a DV hint comment selects deletion vectors)
  *   - UPDATE t SET a=e, … [WHERE p]      (same DV hint)
  *   - MERGE [WITH SCHEMA EVOLUTION] INTO t USING s ON cond
  *     (evolution appends source-only columns to the target schema)
  *     [WHEN MATCHED [AND c] THEN UPDATE SET *|a=e,…|DELETE]…   (ordered,
  *     first-match-wins) [WHEN NOT MATCHED THEN INSERT *]
  *     [WHEN NOT MATCHED BY SOURCE [AND c] THEN UPDATE SET a=e,…|DELETE]…
  *   - OPTIMIZE t [WHERE p] [ZORDER BY (a, b)]   (clustered tables default
  *     to their stored CLUSTER BY layout)
  *   - REORG TABLE t [WHERE p] APPLY (PURGE)   (rewrite DV-carrying files,
  *     materializing soft deletes away)
  *   - VACUUM t [RETAIN n HOURS] [INCLUDE ORPHANS] [DRY RUN]
  *   - RESTORE [TABLE] t TO VERSION AS OF n | TO TIMESTAMP AS OF 'ts'
  *   - DESCRIBE HISTORY t [LIMIT n]  /  DESCRIBE DETAIL t
  *   - ALTER TABLE t ADD CONSTRAINT name CHECK (e)  /  DROP CONSTRAINT name
  *   - ALTER TABLE t ADD COLUMN c type [FIRST | AFTER c0]
  *   - ALTER TABLE t RENAME COLUMN a TO b  /  DROP COLUMN a
  *   - ALTER TABLE t DROP FEATURE f [TRUNCATE HISTORY]   (protocol
  *     downgrade; deletionVectors after a REORG purge)
  *   - ALTER TABLE t SET TBLPROPERTIES (…)  /  UNSET TBLPROPERTIES [IF EXISTS] (…)
  *   - ALTER TABLE t ALTER COLUMN c TYPE type   (protocol type widening)
  *   - ALTER TABLE t CLUSTER BY (a, b) | NONE
  *   - SHOW TBLPROPERTIES t [('key')]
  *   - GENERATE symlink_format_manifest FOR TABLE t
  *   - CREATE TABLE t [PARTITIONED BY (…) | CLUSTER BY (…)] AS SELECT …
  *   - CREATE [OR REPLACE] TABLE t SHALLOW|DEEP CLONE s
  *     [VERSION AS OF n | TIMESTAMP AS OF 'ts']
  *   - INSERT INTO|OVERWRITE t SELECT …|VALUES …|TABLE …
  *   - CONVERT TO DELTA parquet.`/path`
  *
  * Bare-name refs resolve through the session catalog to graft-provider
  * table locations, so name-addressed statements run the same engine
  * paths as path-addressed ones.
  *
  * WHERE clauses parse through Spark's own expression parser and lower
  * to the engine's DNF predicate form; the supported shape is any
  * AND/OR tree over `col op literal` comparisons (op ∈ =, !=, <, <=,
  * >, >=, IN, NOT IN) — the same language the log-level pruner
  * understands, so every SQL predicate prunes files before any scan.
  * Recognized monotone time-function conjuncts — `year(col)`,
  * `to_date(col)` / `date(col)` / `CAST(col AS DATE)`,
  * `date_trunc(unit, col)` compared to a literal — rewrite to EXACT
  * column ranges (session-timezone aware) instead of refusing, so
  * `WHERE year(ts) = 2024` both prunes files and filters rows
  * correctly. Other WHERE shapes refuse loudly rather than scanning
  * wrong.
  *
  * Command results come back as one-row DataFrames of the operation's
  * metrics (or the history/detail/vacuum row sets), so callers can
  * compose them like any query result.
  */
object GraftSql {

  private lazy val logger = org.slf4j.LoggerFactory.getLogger("graft.sql")

  // table reference: delta.`p` | graft.`p` | `p` | 'p' | bare-token.
  // '(' is excluded from the bare alternative so standard SQL
  // `INSERT INTO t(a,b) ...` (no space before the column list) parses
  // as ref `t` + list, not ref `t(a,b)`.
  private val Ref = """(?:(?:delta|graft)\.)?(?:`([^`]+)`|'([^']+)'|([^\s`';(]+))"""

  private val DvHint = """(?is)/\*\+\s*DV\s*\*/"""

  /** Mask the contents of '…' and "…" literals with \u0001, preserving
    * length, so the statement-shape regexes can't match keywords hiding
    * inside string literals (`UPDATE t SET s = 'a WHERE b'` must not
    * split at the quoted WHERE). Positions in the masked text equal
    * positions in the original, so capture groups are extracted from the
    * ORIGINAL statement and literal values flow through intact. Doubled
    * quotes ('it''s') read as two adjacent literals — same chars masked.
    * Backslash-escaped quotes ('don\\'t') mask as escape + escapee, per
    * Spark's default string-literal escaping; under the legacy
    * `escapedStringLiterals=true` dialect (backslash is a plain char) a
    * trailing-backslash literal over-masks, which can only make a
    * statement fail to match a command shape and refuse loudly — never
    * mis-split. */
  private[sql] def maskQuoted(s: String): String = {
    val sb = new java.lang.StringBuilder(s)
    var inQ: Char = 0
    var i = 0
    while (i < sb.length) {
      val c = sb.charAt(i)
      if (inQ != 0) {
        if (c == '\\' && i + 1 < sb.length) {
          sb.setCharAt(i, '\u0001'); i += 1; sb.setCharAt(i, '\u0001')
        } else if (c == inQ) inQ = 0
        else sb.setCharAt(i, '\u0001')
      }
      else if (c == '\'' || c == '"') inQ = c
      i += 1
    }
    sb.toString
  }

  /** Anchored-regex extractor that matches the quote-masked statement but
    * yields capture groups from the original text (see [[maskQuoted]]). */
  private final class Q(pattern: String) {
    private val re = pattern.r
    def unapplySeq(stmt: String): Option[List[String]] = {
      val m = re.pattern.matcher(maskQuoted(stmt))
      if (!m.matches()) None
      else Some(List.tabulate(m.groupCount)(i =>
        if (m.start(i + 1) >= 0) stmt.substring(m.start(i + 1), m.end(i + 1))
        else null))
    }
  }

  /** Resolve a table ref that may be a filesystem path or a catalog
    * table name. Bare names resolve through the session catalog to the
    * location of a graft/delta-provider table, so name-addressed
    * statements run through the SAME engine paths as path-addressed ones
    * (no second code path). The catalog's relation cache is invalidated
    * for named refs so a following `spark.table(name)` re-resolves and
    * sees the post-command state. */
  private def resolveRef(spark: SparkSession, ref: String): String =
    if (ref.contains("/")) ref
    else {
      val ident = spark.sessionState.sqlParser.parseTableIdentifier(ref)
      val catalog = spark.sessionState.catalog
      require(catalog.tableExists(ident),
        s"Table ref '$ref' is neither a path nor an existing catalog table")
      val meta = catalog.getTableMetadata(ident)
      val provider = meta.provider.getOrElse("").toLowerCase
      require(provider == "graft" || provider == "delta",
        s"Catalog table $ref uses provider '$provider' — name-addressed " +
          "Delta commands need a table created USING graft")
      spark.catalog.refreshTable(ref)
      new org.apache.hadoop.fs.Path(meta.location).toString
    }

  /** Non-anchored quote-masked find: groups from the original text. */
  private def findIn(re: Regex, s: String): Option[IndexedSeq[String]] = {
    val m = re.pattern.matcher(maskQuoted(s))
    if (!m.find()) None
    else Some((1 to m.groupCount).map(g =>
      if (m.start(g) >= 0) s.substring(m.start(g), m.end(g)) else null).toIndexedSeq)
  }

  private def existsIn(re: Regex, s: String): Boolean =
    re.pattern.matcher(maskQuoted(s)).find()

  private val DeleteRe = new Q(
    s"""(?is)^\\s*DELETE\\s+FROM\\s+$Ref\\s*(?:WHERE\\s+(.+?))?\\s*;?\\s*$$""")
  private val UpdateRe = new Q(
    s"""(?is)^\\s*UPDATE\\s+$Ref\\s+SET\\s+(.+?)\\s*(?:\\bWHERE\\s+(.+?))?\\s*;?\\s*$$""")
  private val MergeRe = new Q(
    s"""(?is)^\\s*MERGE\\s+(?:(WITH\\s+SCHEMA\\s+EVOLUTION)\\s+)?INTO\\s+$Ref(?:\\s+AS\\s+(\\w+))?\\s+USING\\s+$Ref""" +
      s"""(?:\\s+AS\\s+(\\w+))?\\s+ON\\s+(.+?)((?:\\s+WHEN\\s+.+?)?)\\s*;?\\s*$$""")
  private val OptimizeRe = new Q(
    s"""(?is)^\\s*OPTIMIZE\\s+$Ref\\s*(?:WHERE\\s+(.+?))?""" +
      s"""\\s*(?:ZORDER\\s+BY\\s*\\(?\\s*([\\w,\\s`]+?)\\s*\\)?)?\\s*;?\\s*$$""")
  private val ReorgRe = new Q(
    s"""(?is)^\\s*REORG\\s+TABLE\\s+$Ref\\s*(?:WHERE\\s+(.+?))?""" +
      s"""\\s*APPLY\\s*\\(\\s*PURGE\\s*\\)\\s*;?\\s*$$""")
  private val VacuumRe = new Q(
    s"""(?is)^\\s*VACUUM\\s+$Ref""" +
      s"""\\s*(?:RETAIN\\s+([0-9.]+)\\s+HOURS?)?""" +
      s"""\\s*(INCLUDE\\s+ORPHANS)?\\s*(DRY\\s+RUN)?\\s*;?\\s*$$""")
  private val RestoreVersionRe = new Q(
    s"""(?is)^\\s*RESTORE\\s+(?:TABLE\\s+)?$Ref\\s+TO\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)\\s*;?\\s*$$""")
  private val RestoreTimestampRe = new Q(
    s"""(?is)^\\s*RESTORE\\s+(?:TABLE\\s+)?$Ref\\s+TO\\s+TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)'\\s*;?\\s*$$""")
  private val HistoryRe = new Q(
    s"""(?is)^\\s*DESCRIBE\\s+HISTORY\\s+$Ref\\s*(?:LIMIT\\s+(\\d+))?\\s*;?\\s*$$""")
  private val DetailRe = new Q(
    s"""(?is)^\\s*DESCRIBE\\s+DETAIL\\s+$Ref\\s*;?\\s*$$""")
  private val AddConstraintRe = new Q(
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$Ref\\s+ADD\\s+CONSTRAINT\\s+(\\w+)""" +
      s"""\\s+CHECK\\s*\\((.+)\\)\\s*;?\\s*$$""")
  private val DropConstraintRe = new Q(
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$Ref\\s+DROP\\s+CONSTRAINT\\s+(\\w+)\\s*;?\\s*$$""")
  private val ConvertRe = new Q(
    s"""(?is)^\\s*CONVERT\\s+TO\\s+DELTA\\s+(?:parquet\\.)?(?:`([^`]+)`|'([^']+)'|([^\\s`';]+))\\s*;?\\s*$$""")
  private val AddColumnRe = new Q(
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$Ref\\s+ADD\\s+COLUMNS?\\s*\\(?\\s*`?(\\w+)`?\\s+([\\w<>(),:\\s]+?)\\s*\\)?\\s*(?:(FIRST)|AFTER\\s+`?(\\w+)`?)?\\s*;?\\s*$$""")
  private val RenameColumnRe = new Q(
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$Ref\\s+RENAME\\s+COLUMN\\s+`?(\\w+)`?\\s+TO\\s+`?(\\w+)`?\\s*;?\\s*$$""")
  private val DropColumnRe = new Q(
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$Ref\\s+DROP\\s+COLUMN\\s+`?(\\w+)`?\\s*;?\\s*$$""")
  private val DropFeatureRe = new Q(
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$Ref\\s+DROP\\s+FEATURE\\s+`?(\\w+)`?""" +
      s"""\\s*(TRUNCATE\\s+HISTORY)?\\s*;?\\s*$$""")
  private val SetPropsRe = new Q(
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$Ref\\s+SET\\s+TBLPROPERTIES\\s*\\((.+)\\)\\s*;?\\s*$$""")
  private val UnsetPropsRe = new Q(
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$Ref\\s+UNSET\\s+TBLPROPERTIES\\s*(IF\\s+EXISTS)?\\s*\\((.+)\\)\\s*;?\\s*$$""")
  private val ShowPropsRe = new Q(
    s"""(?is)^\\s*SHOW\\s+TBLPROPERTIES\\s+$Ref\\s*(?:\\(\\s*'?([^')]+?)'?\\s*\\))?\\s*;?\\s*$$""")
  private val GenerateRe = new Q(
    s"""(?is)^\\s*GENERATE\\s+(\\w+)\\s+FOR\\s+TABLE\\s+$Ref\\s*;?\\s*$$""")
  private val AlterColumnTypeRe = new Q(
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$Ref\\s+(?:ALTER|CHANGE)\\s+COLUMN\\s+`?(\\w+)`?\\s+TYPE\\s+([\\w(),\\s]+?)\\s*;?\\s*$$""")
  private val ClusterByRe = new Q(
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$Ref\\s+CLUSTER\\s+BY\\s+(?:\\(([\\w,\\s`]*)\\)|NONE)\\s*;?\\s*$$""")
  private val CloneRe = new Q(
    s"""(?is)^\\s*CREATE\\s+(OR\\s+REPLACE\\s+)?TABLE\\s+$Ref\\s+(SHALLOW|DEEP)\\s+CLONE\\s+$Ref""" +
      s"""(?:\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)|\\s+TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)')?\\s*;?\\s*$$""")
  private val InsertRe = new Q(
    s"""(?is)^\\s*INSERT\\s+(INTO|OVERWRITE)\\s+(?:TABLE\\s+)?$Ref\\s*(?:\\(([\\w,\\s`]+)\\)\\s*)?\\s+(SELECT\\s+.+|VALUES\\s+.+|TABLE\\s+.+)\\s*;?\\s*$$""")
  private val TruncateRe = new Q(
    s"""(?is)^\\s*TRUNCATE\\s+TABLE\\s+$Ref\\s*;?\\s*$$""")
  private val FsckRe = new Q(
    s"""(?is)^\\s*FSCK\\s+REPAIR\\s+TABLE\\s+$Ref\\s*(DRY\\s+RUN)?\\s*;?\\s*$$""")
  private val SetDefaultRe = new Q(
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$Ref\\s+(?:ALTER|CHANGE)\\s+COLUMN\\s+`?(\\w+)`?\\s+SET\\s+DEFAULT\\s+(.+?)\\s*;?\\s*$$""")
  private val DropDefaultRe = new Q(
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$Ref\\s+(?:ALTER|CHANGE)\\s+COLUMN\\s+`?(\\w+)`?\\s+DROP\\s+DEFAULT\\s*;?\\s*$$""")
  private val CtasRe = new Q(
    s"""(?is)^\\s*CREATE\\s+(OR\\s+REPLACE\\s+)?TABLE\\s+$Ref""" +
      s"""(?:\\s+PARTITIONED\\s+BY\\s*\\(([\\w,\\s`]+)\\))?""" +
      s"""(?:\\s+CLUSTER\\s+BY\\s*\\(([\\w,\\s`]+)\\))?\\s+AS\\s+(SELECT\\s+.+)\\s*;?\\s*$$""")
  private val ShowPartitionsRe = new Q(
    s"""(?is)^\\s*SHOW\\s+PARTITIONS\\s+$Ref\\s*;?\\s*$$""")
  private val DescribeTableRe = new Q(
    s"""(?is)^\\s*DESCRIBE\\s+(?:TABLE\\s+)?$Ref\\s*;?\\s*$$""")

  def sql(spark: SparkSession, statement: String): DataFrame = {
    // strip DV hints by masked position so a hint-shaped substring inside
    // a string literal is left alone
    var stmt = statement
    var useDv = false
    var hint = DvHint.r.pattern.matcher(maskQuoted(stmt))
    while (hint.find()) {
      useDv = true
      stmt = stmt.substring(0, hint.start) + " " + stmt.substring(hint.end)
      hint = DvHint.r.pattern.matcher(maskQuoted(stmt))
    }
    stmt match {
      case DeleteRe(p1, p2, p3, where) =>
        val path = resolveRef(spark, Seq(p1, p2, p3).find(_ != null).get)
        // DNF when the WHERE lowers (log pruning + scan filter); outside
        // the DNF language (NOT over AND, arithmetic, IS NULL, other
        // functions) fall back to scan-side execution of the raw Spark
        // expression — correct, just not prune-accelerated. A WHERE Spark
        // can't parse still refuses (at expr()).
        val r = nonDnfFallback(spark, Option(where), path) match {
          case Left(filters) =>
            if (useDv) GraftDelta.deleteWhereWithDv(spark, path, filters)
            else GraftDelta.deleteWhere(spark, path, filters)
          case Right(cond) =>
            if (useDv) graft.delta.DeltaDml.deleteWithDvExpr(spark, path, cond)
            else graft.delta.DeltaDml.deleteExpr(spark, path, cond)
        }
        dmlFrame(spark, "DELETE", r)
      case UpdateRe(p1, p2, p3, setClause, where) =>
        val path = resolveRef(spark, Seq(p1, p2, p3).find(_ != null).get)
        val set = assignmentsOf(setClause)
        val r = nonDnfFallback(spark, Option(where), path) match {
          case Left(filters) =>
            if (useDv) GraftDelta.updateWhereWithDv(spark, path, filters, set)
            else GraftDelta.updateWhere(spark, path, filters, set)
          case Right(cond) =>
            if (useDv) graft.delta.DeltaDml.updateWithDvExpr(spark, path, cond, set)
            else graft.delta.DeltaDml.updateExpr(spark, path, cond, set)
        }
        dmlFrame(spark, "UPDATE", r)
      case MergeRe(evo, t1, t2, t3, tAlias, s1, s2, s3, sAlias, on, clauses) =>
        runMerge(spark, resolveRef(spark, Seq(t1, t2, t3).find(_ != null).get),
          Option(tAlias),
          Seq(s1, s2, s3).find(_ != null).get, Option(sAlias), on,
          Option(clauses).getOrElse(""), schemaEvolution = evo != null)
      case OptimizeRe(p1, p2, p3, where, zorderCols) =>
        val path = resolveRef(spark, Seq(p1, p2, p3).find(_ != null).get)
        val filters = dnfOf(spark, Option(where), colTypesOf(spark, path))
        val sortBy = Option(zorderCols).toSeq
          .flatMap(_.split(",")).map(_.trim.stripPrefix("`").stripSuffix("`"))
          .filter(_.nonEmpty)
        val (before, after) = DeltaMaintenance.compact(spark, path,
          sortBy = sortBy, zorder = sortBy.size >= 2, where = filters)
        oneRow(spark, Seq("operation", "filesBefore", "filesAfter"),
          Row("OPTIMIZE", before, after))
      case ReorgRe(p1, p2, p3, where) =>
        val path = resolveRef(spark, Seq(p1, p2, p3).find(_ != null).get)
        val filters = dnfOf(spark, Option(where), colTypesOf(spark, path))
        val (before, after) = DeltaMaintenance.reorgPurge(spark, path, filters)
        oneRow(spark, Seq("operation", "filesBefore", "filesAfter"),
          Row("REORG", before, after))
      case VacuumRe(p1, p2, p3, hours, orphans, dry) =>
        val path = resolveRef(spark, Seq(p1, p2, p3).find(_ != null).get)
        // RETAIN overrides; without it the table's
        // delta.deletedFileRetentionDuration property is the default
        // (the delta-spark contract), falling back to 7 days
        val retention = Option(hours).map(_.toDouble).getOrElse(
          DeltaLog.forTable(spark, path).snapshot(None)
            .metadata.configuration.get("delta.deletedFileRetentionDuration")
            .flatMap(graft.delta.DeltaMaintenance.parseRetentionHours)
            .getOrElse(168.0))
        val deleted = GraftDelta.vacuum(spark, path, retention, dryRun = dry != null,
          includeOrphans = orphans != null)
        import spark.implicits._
        deleted.toDF("path")
      case RestoreVersionRe(p1, p2, p3, v) =>
        val path = resolveRef(spark, Seq(p1, p2, p3).find(_ != null).get)
        val r = GraftDelta.restore(spark, path, v.toLong)
        oneRow(spark, Seq("operation", "tableVersion", "restoredToVersion"),
          Row("RESTORE", r.tableVersion, v.toLong))
      case RestoreTimestampRe(p1, p2, p3, ts) =>
        val path = resolveRef(spark, Seq(p1, p2, p3).find(_ != null).get)
        // the READER's parser (zone-less strings are UTC, bare dates and
        // ISO offsets accepted) — SQL RESTORE and read-path time travel
        // must resolve the same string to the same millis on any JVM zone
        val millis = graft.delta.DeltaRead.parseTimestampMillis(ts)
        val target = DeltaLog.forTable(spark, path).versionAtOrBefore(millis)
        val r = GraftDelta.restore(spark, path, target)
        oneRow(spark, Seq("operation", "tableVersion", "restoredToVersion"),
          Row("RESTORE", r.tableVersion, target))
      case HistoryRe(p1, p2, p3, limit) =>
        val path = resolveRef(spark, Seq(p1, p2, p3).find(_ != null).get)
        GraftDelta.readDeltaHistory(spark, path, Option(limit).map(_.toInt))
      case DetailRe(p1, p2, p3) =>
        GraftDelta.tableDetail(spark,
          resolveRef(spark, Seq(p1, p2, p3).find(_ != null).get))
      case AddConstraintRe(p1, p2, p3, name, check) =>
        val path = resolveRef(spark, Seq(p1, p2, p3).find(_ != null).get)
        val r = GraftDelta.addCheckConstraint(spark, path, name, check)
        oneRow(spark, Seq("operation", "tableVersion", "constraint"),
          Row("ADD CONSTRAINT", r.tableVersion, name))
      case DropConstraintRe(p1, p2, p3, name) =>
        val path = resolveRef(spark, Seq(p1, p2, p3).find(_ != null).get)
        val r = GraftDelta.dropConstraint(spark, path, name)
        oneRow(spark, Seq("operation", "tableVersion", "constraint"),
          Row("DROP CONSTRAINT", r.tableVersion, name))
      case AddColumnRe(p1, p2, p3, name, typeStr, firstKw, afterCol) =>
        val path = resolveRef(spark, Seq(p1, p2, p3).find(_ != null).get)
        val dt = spark.sessionState.sqlParser.parseDataType(typeStr.trim)
        val r = GraftDelta.addColumn(spark, path, name, dt,
          after = Option(afterCol), first = firstKw != null)
        oneRow(spark, Seq("operation", "tableVersion"),
          Row("ADD COLUMN", r.tableVersion))
      case RenameColumnRe(p1, p2, p3, from, to) =>
        val path = resolveRef(spark, Seq(p1, p2, p3).find(_ != null).get)
        val r = GraftDelta.renameColumn(spark, path, from, to)
        oneRow(spark, Seq("operation", "tableVersion"),
          Row("RENAME COLUMN", r.tableVersion))
      case DropColumnRe(p1, p2, p3, colName) =>
        val path = resolveRef(spark, Seq(p1, p2, p3).find(_ != null).get)
        val r = GraftDelta.dropColumn(spark, path, colName)
        oneRow(spark, Seq("operation", "tableVersion"),
          Row("DROP COLUMN", r.tableVersion))
      case DropFeatureRe(p1, p2, p3, feature, truncate) =>
        val path = resolveRef(spark, Seq(p1, p2, p3).find(_ != null).get)
        val r = DeltaTableOps.dropFeature(spark, path, feature,
          truncateHistory = truncate != null)
        oneRow(spark,
          Seq("operation", "tableVersion", "checkpointed", "removedLogFiles"),
          Row("DROP FEATURE", r.tableVersion, r.checkpointed, r.removedLogFiles))
      case SetPropsRe(p1, p2, p3, propList) =>
        val path = resolveRef(spark, Seq(p1, p2, p3).find(_ != null).get)
        val props = splitAssignments(propList).map { kv =>
          val i = kv.indexOf('=')
          require(i > 0, s"Malformed property: $kv")
          def unq(s: String) = s.trim.stripPrefix("'").stripSuffix("'")
            .stripPrefix("\"").stripSuffix("\"")
          unq(kv.substring(0, i)) -> unq(kv.substring(i + 1))
        }.toMap
        // properties with dedicated enable paths route there
        val version = props.toSeq match {
          case Seq(("delta.enableChangeDataFeed", v)) if v.equalsIgnoreCase("true") =>
            GraftDelta.enableChangeDataFeed(spark, path)
          case Seq(("delta.columnMapping.mode", "name")) =>
            GraftDelta.enableColumnMapping(spark, path).tableVersion
          case Seq(("delta.enableRowTracking", v)) if v.equalsIgnoreCase("true") =>
            GraftDelta.enableRowTracking(spark, path)
          case Seq(("delta.enableInCommitTimestamps", v)) if v.equalsIgnoreCase("true") =>
            GraftDelta.enableInCommitTimestamps(spark, path)
          case _ => DeltaTableOps.setTableProperties(spark, path, props)
        }
        oneRow(spark, Seq("operation", "tableVersion"),
          Row("SET TBLPROPERTIES", version))
      case UnsetPropsRe(p1, p2, p3, ifExists, keyList) =>
        val path = resolveRef(spark, Seq(p1, p2, p3).find(_ != null).get)
        def unq(s: String) = s.trim.stripPrefix("'").stripSuffix("'")
          .stripPrefix("\"").stripSuffix("\"")
        val keys = splitAssignments(keyList).map(unq).filter(_.nonEmpty)
        val version = DeltaTableOps.unsetTableProperties(
          spark, path, keys, ifExists != null)
        oneRow(spark, Seq("operation", "tableVersion"),
          Row("UNSET TBLPROPERTIES", version))
      case ShowPropsRe(p1, p2, p3, key) =>
        val path = resolveRef(spark, Seq(p1, p2, p3).find(_ != null).get)
        val cfg = DeltaLog.forTable(spark, path).snapshot(None)
          .metadata.configuration
        val rows = Option(key).map(_.trim) match {
          case Some(k) => cfg.get(k).map(v => Row(k, v)).toSeq
          case None => cfg.toSeq.sortBy(_._1).map { case (k, v) => Row(k, v) }
        }
        spark.createDataFrame(
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava,
          StructType(Seq(StructField("key", StringType, nullable = false),
            StructField("value", StringType, nullable = false))))
      case FsckRe(p1, p2, p3, dry) =>
        val path = resolveRef(spark, Seq(p1, p2, p3).find(_ != null).get)
        val r = DeltaTableOps.fsckRepair(spark, path, dryRun = dry != null)
        oneRow(spark, Seq("operation", "tableVersion", "removedEntries"),
          Row(if (dry != null) "FSCK DRY RUN" else "FSCK", r.tableVersion,
            r.removedEntries))
      case TruncateRe(p1, p2, p3) =>
        val path = resolveRef(spark, Seq(p1, p2, p3).find(_ != null).get)
        val r = DeltaTableOps.truncateTable(spark, path)
        oneRow(spark, Seq("operation", "tableVersion", "removedFiles", "deletedRows"),
          Row("TRUNCATE", r.tableVersion, r.removedFiles, r.removedRows))
      case SetDefaultRe(p1, p2, p3, colName, defExpr) =>
        val path = resolveRef(spark, Seq(p1, p2, p3).find(_ != null).get)
        val version = DeltaTableOps.setColumnDefault(spark, path, colName, defExpr)
        oneRow(spark, Seq("operation", "tableVersion"),
          Row("SET DEFAULT", version))
      case DropDefaultRe(p1, p2, p3, colName) =>
        val path = resolveRef(spark, Seq(p1, p2, p3).find(_ != null).get)
        val version = DeltaTableOps.dropColumnDefault(spark, path, colName)
        oneRow(spark, Seq("operation", "tableVersion"),
          Row("DROP DEFAULT", version))
      case AlterColumnTypeRe(p1, p2, p3, colName, typeStr) =>
        val path = resolveRef(spark, Seq(p1, p2, p3).find(_ != null).get)
        val dt = spark.sessionState.sqlParser.parseDataType(typeStr.trim)
        val version = DeltaTableOps.widenColumnType(spark, path, colName, dt)
        oneRow(spark, Seq("operation", "tableVersion"),
          Row("ALTER COLUMN TYPE", version))
      case ClusterByRe(p1, p2, p3, colList) =>
        val path = resolveRef(spark, Seq(p1, p2, p3).find(_ != null).get)
        val cols = Option(colList).toSeq.flatMap(_.split(","))
          .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty)
        val version = DeltaTableOps.clusterBy(spark, path, cols)
        oneRow(spark, Seq("operation", "tableVersion"),
          Row("CLUSTER BY", version))
      case GenerateRe(mode, p1, p2, p3) =>
        val path = resolveRef(spark, Seq(p1, p2, p3).find(_ != null).get)
        require(mode.equalsIgnoreCase("symlink_format_manifest"),
          s"Unknown GENERATE mode '$mode' — supported: symlink_format_manifest")
        val n = DeltaTableOps.generateSymlinkManifest(spark, path)
        oneRow(spark, Seq("operation", "manifests"),
          Row("GENERATE", n))
      case CloneRe(orReplace, t1, t2, t3, flavor, s1, s2, s3, v, ts) =>
        val target = Seq(t1, t2, t3).find(_ != null).get
        val source = resolveRef(spark, Seq(s1, s2, s3).find(_ != null).get)
        val deep = flavor.equalsIgnoreCase("DEEP")
        val replace = orReplace != null
        // TIMESTAMP AS OF resolves through the READER's parser and the
        // same per-commit clock as time travel, so clone/read/CDF can
        // never disagree about "when" — including on non-UTC JVMs
        val version = Option(v).map(_.toLong).orElse(Option(ts).map { t =>
          val millis = graft.delta.DeltaRead.parseTimestampMillis(t)
          DeltaLog.forTable(spark, source).versionAtOrBefore(millis)
        })
        val r =
          if (deep) GraftDelta.deepClone(spark, source, target, version, replace)
          else GraftDelta.shallowClone(spark, source, target, version, replace)
        oneRow(spark, Seq("operation", "tableVersion", "clonedFiles"),
          Row(if (deep) "DEEP CLONE" else "SHALLOW CLONE",
            r.tableVersion, r.clonedFiles))
      case InsertRe(kind, p1, p2, p3, colList, query) =>
        val path = resolveRef(spark, Seq(p1, p2, p3).find(_ != null).get)
        val raw = spark.sql(rewriteDeltaRefs(spark,
          if (query.trim.toUpperCase.startsWith("VALUES")) s"SELECT * FROM ($query)"
          else query))
        val snap = DeltaLog.forTable(spark, path).snapshot(None)
        val target = snap.schema
        import org.apache.spark.sql.functions.{col, expr, lit}
        val frame =
          if (colList == null) {
            // SQL INSERT binds columns by POSITION against the table schema
            require(raw.columns.length == target.fields.length,
              s"INSERT arity mismatch: query returns ${raw.columns.length} columns, " +
                s"table has ${target.fields.length}")
            raw.toDF(target.fieldNames.toIndexedSeq: _*)
              .select(target.fields.map(f => col(f.name).cast(f.dataType)).toIndexedSeq: _*)
          } else {
            // an explicit column list binds the query positionally to the
            // LISTED columns; omitted columns fill their declared DEFAULT
            // (CURRENT_DEFAULT metadata — the allowColumnDefaults writer
            // obligation), generated/identity columns stay absent so the
            // write path computes/allocates them, and plain nullable
            // columns fill null (SQL standard); non-nullable without a
            // default refuses loudly
            val listed = colList.split(",")
              .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty).toSeq
            val resolved = listed.map(n =>
              target.fields.find(_.name.equalsIgnoreCase(n)).getOrElse(
                throw new IllegalArgumentException(
                  s"INSERT column $n not in ${target.fieldNames.mkString(", ")}")).name)
            require(resolved.distinct.length == resolved.length,
              s"duplicate columns in INSERT list: ${listed.mkString(", ")}")
            require(raw.columns.length == resolved.length,
              s"INSERT arity mismatch: query returns ${raw.columns.length} columns, " +
                s"column list has ${resolved.length}")
            val defaults = DeltaTableOps.columnDefaultsOf(snap).toMap
            val computedCols = DeltaTableOps.writerComputedColumnsOf(snap)
            val base = raw.toDF(resolved.toIndexedSeq: _*)
            val outCols = target.fields.toSeq.flatMap { f =>
              if (resolved.contains(f.name)) Some(col(f.name).cast(f.dataType).as(f.name))
              else defaults.get(f.name) match {
                case Some(d) => Some(expr(d).cast(f.dataType).as(f.name))
                case None if computedCols.contains(f.name) => None
                case None =>
                  require(f.nullable,
                    s"INSERT omits non-nullable column ${f.name} with no DEFAULT")
                  Some(lit(null).cast(f.dataType).as(f.name))
              }
            }
            base.select(outCols: _*)
          }
        val mode = if (kind.equalsIgnoreCase("OVERWRITE")) "overwrite" else "append"
        GraftDelta.toDelta(frame, path, mode = mode)
        val v = DeltaLog.forTable(spark, path).latestVersion
        oneRow(spark, Seq("operation", "tableVersion", "rows"),
          Row(s"INSERT ${kind.toUpperCase}", v, committedRows(spark, path, v)))
      case CtasRe(orReplace, p1, p2, p3, partCols, clusterCols, query) =>
        val path = resolveRef(spark, Seq(p1, p2, p3).find(_ != null).get)
        val frame = spark.sql(rewriteDeltaRefs(spark, query))
        def cols(raw: String) = Option(raw).toSeq
          .flatMap(_.split(",")).map(_.trim.stripPrefix("`").stripSuffix("`"))
          .filter(_.nonEmpty)
        val partitionBy = cols(partCols)
        val clusterBy = cols(clusterCols)
        require(partitionBy.isEmpty || clusterBy.isEmpty,
          "CREATE TABLE takes PARTITIONED BY or CLUSTER BY, not both " +
            "(competing physical layouts)")
        // OR REPLACE: a protocol-correct overwrite of an existing table
        // (one commit removing the prior snapshot's files), schema
        // replacement included; plain CREATE keeps refusing on existing
        val replacing = orReplace != null &&
          graft.delta.GraftTable.isDeltaTable(spark, path)
        GraftDelta.toDelta(frame, path,
          mode = if (replacing) "overwrite" else "error",
          partitionBy = partitionBy, overwriteSchema = replacing)
        val ctasV = DeltaLog.forTable(spark, path).latestVersion
        if (clusterBy.nonEmpty) DeltaTableOps.clusterBy(spark, path, clusterBy)
        oneRow(spark, Seq("operation", "tableVersion", "rows"),
          Row(if (replacing) "REPLACE TABLE AS SELECT" else "CREATE TABLE AS SELECT",
            if (clusterBy.nonEmpty) ctasV + 1 else ctasV,
            committedRows(spark, path, ctasV)))
      case s @ ShowPartitionsRe(p1, p2, p3) =>
        // answered from the log alone (partition values ride the adds):
        // zero data I/O at any table size. A ref that is NOT a graft
        // table (a temp view, a hive table, a path-shaped non-Delta
        // location) falls through to spark.sql — the Try covers the
        // SNAPSHOT LOAD too, not just name resolution, because a
        // path-shaped ref always "resolves" and only the log read can
        // tell it isn't ours. Partition-less Delta tables REFUSE (the
        // delta-spark contract) instead of listing N empty tuples.
        (try {
          val path = resolveRef(spark, Seq(p1, p2, p3).find(_ != null).get)
          val snap = DeltaLog.forTable(spark, path).snapshot(None)
          Some((path, snap.partitionColumns))
        } catch { case _: IllegalArgumentException => None })
          .map { case (path, partCols2) =>
            require(partCols2.nonEmpty,
              s"SHOW PARTITIONS is not allowed on a table that is not partitioned")
            val pc = DeltaTableOps.partitionCounts(spark, path)
            pc.df.select(
                partCols2.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
              .orderBy(
                partCols2.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
          }.getOrElse(spark.sql(rewriteDeltaRefs(spark, s)))
      case s @ DescribeTableRe(p1, p2, p3) =>
        // same fall-through stance: only graft/delta refs are ours — the
        // Try covers the snapshot load (a path-shaped non-Delta ref
        // passes resolveRef but fails the log read)
        (try {
          val path = resolveRef(spark, Seq(p1, p2, p3).find(_ != null).get)
          Some(DeltaLog.forTable(spark, path).snapshot(None))
        } catch { case _: IllegalArgumentException => None })
          .map { snap =>
            val partSet = snap.partitionColumns.toSet
            val rows = snap.schema.fields.toSeq.map(f =>
              Row(f.name, f.dataType.simpleString,
                if (partSet.contains(f.name)) "partition column" else ""))
            spark.createDataFrame(
              scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava,
              StructType(Seq(
                StructField("col_name", StringType, nullable = false),
                StructField("data_type", StringType, nullable = false),
                StructField("comment", StringType, nullable = false))))
          }.getOrElse(spark.sql(rewriteDeltaRefs(spark, s)))
      case ConvertRe(p1, p2, p3) =>
        val path = resolveRef(spark, Seq(p1, p2, p3).find(_ != null).get)
        val r = GraftDelta.convertToDelta(spark, path)
        oneRow(spark, Seq("operation", "numFiles", "partitionColumns"),
          Row("CONVERT", r.numFiles, r.partitionColumns.mkString(",")))
      case s @ CountStarRe(alias, p1, p2, p3, where) =>
        val ref = Seq(p1, p2, p3).find(_ != null).get
        // resolveRef may refuse (a non-graft catalog table, a plain temp
        // view): that's the fall-through SELECT's job, not an error here
        scala.util.Try(resolveRef(spark, ref)).toOption
          .flatMap(p => metadataCount(spark, Option(alias), p, Option(where)))
          .getOrElse(spark.sql(rewriteDeltaRefs(spark, s)))
      case other => spark.sql(rewriteDeltaRefs(spark, other))
    }
  }

  // `SELECT COUNT(*) FROM delta.`p` [WHERE dnf]` answers from log
  // metadata (statsAggregate / the hybrid countWhere) — the most common
  // query against a lake table becomes O(active-files) driver work
  // instead of a full scan. Non-DNF predicates fall through to the
  // ordinary SELECT path: this is an exact-answer optimization, never a
  // semantic change.
  private val CountStarRe = new Q(
    s"""(?is)^\\s*SELECT\\s+COUNT\\s*\\(\\s*\\*\\s*\\)\\s*(?:AS\\s+(\\w+))?""" +
      s"""\\s+FROM\\s+$Ref\\s*(?:WHERE\\s+(.+?))?\\s*;?\\s*$$""")

  private def metadataCount(
      spark: SparkSession, alias: Option[String], path: String,
      where: Option[String]): Option[DataFrame] = {
    try {
      val n = where.map(_.trim).filter(_.nonEmpty) match {
        case None =>
          val r = DeltaTableOps.statsAggregate(spark, path, Nil)
          r.df.select("n_rows").head().getLong(0)
        case Some(w) =>
          DeltaTableOps.countWhere(spark, path,
            dnfOf(spark, Some(w), colTypesOf(spark, path))).count
      }
      Some(oneRow(spark, Seq(alias.getOrElse("count(1)")), Row(n)))
    } catch {
      // Only the expected refusals fall back to the (exact, slower) scan
      // path: not-a-graft-table or a WHERE outside the DNF language. IO
      // and log-corruption errors propagate — hiding them behind a
      // silent slow path would mask real damage.
      case e: IllegalArgumentException =>
        logger.info(s"metadata COUNT(*) fell back to scan for $path: ${e.getMessage}")
        None
    }
  }

  // SELECT-side support: delta.`/path` table refs (with optional
  // VERSION/TIMESTAMP AS OF time travel) register as temp views over the
  // engine's reader, then the statement runs through spark.sql — the
  // full Spark SELECT surface over graft tables, time travel included.
  private val DeltaRefRe =
    ("""(?is)(?:delta|graft)\.`([^`]+)`""" +
      """(\s+VERSION\s+AS\s+OF\s+(\d+)|\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)')?""").r

  /** Collision-proof temp-view name for a table ref: every character of
    * the (path, version, timestamp) triple either passes through
    * (lowercase letters / digits) or escapes to a fixed-width `_uXXXX`
    * code, so the encoding is injective — two distinct refs can never
    * share a view name. (The previous scheme truncated a 32-bit
    * `hashCode` — birthday-colliding refs silently bound one reference
    * to the other table's data.) Uppercase escapes too because Spark
    * resolves temp-view names case-insensitively. Decoding is
    * unambiguous: '_' occurs only as the head of a 6-char escape, and
    * the `_v`/`_t` separators can't appear inside one ('v'/'t' aren't
    * hex digits). */
  private[sql] def viewNameFor(
      path: String, version: Option[Long], ts: Option[String]): String = {
    def esc(s: String): String = s.flatMap { c =>
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) c.toString
      else f"_u${c.toInt}%04x"
    }
    "graft_ref_" + esc(path) +
      version.map(v => "_v" + v).getOrElse("") +
      ts.map(t => "_t" + esc(t)).getOrElse("")
  }

  /** `table_changes('t', start[, end])` — the delta-spark change-feed
    * TVF, with INCLUSIVE version bounds: each call site becomes a temp
    * view over the engine's change-feed planner (batched DV-diff
    * loading, cdc-file preference), so the feed composes with the whole
    * SELECT surface (joins, filters, aggregates). */
  private val TableChangesRe =
    ("""(?is)table_changes\s*\(\s*'([^']+)'\s*,\s*(\d+)""" +
      """(?:\s*,\s*(\d+))?\s*\)""").r

  private def rewriteTableChanges(spark: SparkSession, statement: String): String = {
    val m = TableChangesRe.pattern.matcher(maskQuoted(statement))
    val sb = new StringBuilder
    var last = 0
    while (m.find()) {
      val ref = statement.substring(m.start(1), m.end(1))
      val start = statement.substring(m.start(2), m.end(2)).toLong
      val end =
        if (m.start(3) >= 0) Some(statement.substring(m.start(3), m.end(3)).toLong)
        else None
      val path = resolveRef(spark, ref)
      val view = ("graft_tvf_" +
        java.security.MessageDigest.getInstance("SHA-256")
          .digest(s"$path|$start|$end".getBytes("UTF-8"))
          .take(12).map("%02x".format(_)).mkString)
      // inclusive start → the engine's (from, hi] contract shifts by one
      graft.delta.DeltaTableOps.tableChanges(spark, path, start - 1, end)
        .createOrReplaceTempView(view)
      sb.append(statement.substring(last, m.start)).append(view)
      last = m.end
    }
    sb.append(statement.substring(last)).toString
  }

  private def rewriteDeltaRefs(spark: SparkSession, statement0: String): String = {
    val statement = rewriteTableChanges(spark, statement0)
    // find refs in the quote-masked text (a literal containing
    // "delta.`x`" is data, not a table ref) but read them from the
    // original
    val m = DeltaRefRe.pattern.matcher(maskQuoted(statement))
    val sb = new StringBuilder
    var last = 0
    while (m.find()) {
      val path = statement.substring(m.start(1), m.end(1))
      val version =
        if (m.start(3) >= 0) Some(statement.substring(m.start(3), m.end(3)).toLong)
        else None
      val ts =
        if (m.start(4) >= 0) Some(statement.substring(m.start(4), m.end(4)))
        else None
      val view = viewNameFor(path, version, ts)
      GraftDelta.readDelta(spark, path, version = version, timestamp = ts)
        .createOrReplaceTempView(view)
      sb.append(statement.substring(last, m.start)).append(view)
      last = m.end
    }
    sb.append(statement.substring(last)).toString
  }

  // ---- MERGE ------------------------------------------------------------

  /** One MERGE clause, in order: kind (MATCHED / NOT MATCHED [BY
    * TARGET] / NOT MATCHED BY SOURCE), optional AND-condition, action.
    * Multiple MATCHED / BY SOURCE clauses evaluate first-match-wins —
    * the delta-spark grammar. */
  private val MergeClauseRe =
    ("""(?is)WHEN\s+(NOT\s+MATCHED\s+BY\s+SOURCE|NOT\s+MATCHED(?:\s+BY\s+TARGET)?|MATCHED)""" +
      """(?:\s+AND\s+(.+?))?\s+(?:THEN\s+)?""" +
      """(DELETE|INSERT\s+\*|UPDATE\s+SET\s+.+?)\s*(?=WHEN\s+|$)""").r

  private def runMerge(
      spark: SparkSession, targetPath: String, targetAlias: Option[String],
      sourceRef: String, sourceAlias: Option[String], onClause: String,
      clauses: String, schemaEvolution: Boolean = false): DataFrame = {
    val source = sourceFrame(spark, sourceRef)
    val keys = equiKeysOf(spark, onClause, targetAlias, sourceAlias)

    // source-column references (s.col / source.col) map to the engine's
    // src() marker columns; target-alias prefixes strip. Matches are
    // located in the quote-MASKED text (masking is length-preserving) so
    // an alias token INSIDE a string literal ('s.smith') is data and
    // survives verbatim — only real references rewrite.
    val srcAliases = (sourceAlias.toSeq :+ "source").distinct
    val tgtAliases = (targetAlias.toSeq :+ "target").distinct
    def rewriteRefs(raw: String): String = {
      val masked = maskQuoted(raw)
      val pat = java.util.regex.Pattern.compile(
        "(?i)\\b(" + (srcAliases ++ tgtAliases)
          .map(java.util.regex.Pattern.quote).mkString("|") + ")\\.")
      val m = pat.matcher(masked)
      val out = new StringBuilder
      var last = 0
      while (m.find()) {
        out.append(raw.substring(last, m.start))
        if (srcAliases.exists(_.equalsIgnoreCase(m.group(1))))
          out.append("__graft_src_")
        // target-alias prefixes strip: append nothing
        last = m.end
      }
      out.append(raw.substring(last)).toString
    }
    def setOf(updateBody: String): Map[String, org.apache.spark.sql.Column] =
      splitAssignments(updateBody.trim.replaceFirst("(?is)^UPDATE\\s+SET\\s+", ""))
        .map { a =>
          val (name, raw) = splitOnce(a)
          name -> expr(rewriteRefs(raw))
        }.toMap

    val matchedClauses = Seq.newBuilder[DeltaDml.MatchedClause]
    val bySourceClauses = Seq.newBuilder[DeltaDml.BySourceClause]
    var insertNotMatched = false
    var sawAny = false
    // clause shapes match against the quote-MASKED text (keywords inside
    // string literals must not split clauses); bodies extract from the
    // ORIGINAL by position — masking is length-preserving
    MergeClauseRe.findAllMatchIn(maskQuoted(clauses)).foreach { m =>
      sawAny = true
      def orig(g: Int): String =
        if (m.start(g) < 0) null else clauses.substring(m.start(g), m.end(g))
      val kind = m.group(1).toUpperCase.replaceAll("\\s+", " ")
      val cond = Option(orig(2)).map(c => expr(rewriteRefs(c)))
      val maskedAction = m.group(3).trim
      val action = orig(3).trim
      kind match {
        case "MATCHED" =>
          val a =
            if (maskedAction.equalsIgnoreCase("DELETE")) DeltaDml.WhenMatched.Delete
            else if (maskedAction.matches("(?is)UPDATE\\s+SET\\s+\\*"))
              DeltaDml.WhenMatched.UpdateAll
            else DeltaDml.WhenMatched.Update(setOf(action))
          matchedClauses += DeltaDml.MatchedClause(a, cond)
        case "NOT MATCHED BY SOURCE" =>
          val a =
            if (maskedAction.equalsIgnoreCase("DELETE")) DeltaDml.BySourceAction.Delete
            else if (maskedAction.matches("(?is)UPDATE\\s+SET\\s+\\*"))
              throw new IllegalArgumentException(
                "WHEN NOT MATCHED BY SOURCE UPDATE SET * is meaningless — no source row")
            else DeltaDml.BySourceAction.Update(setOf(action))
          bySourceClauses += DeltaDml.BySourceClause(a, cond)
        case _ => // NOT MATCHED [BY TARGET]
          require(maskedAction.matches("(?is)INSERT\\s+\\*"),
            s"Unsupported WHEN NOT MATCHED action: $action — only INSERT * is supported")
          require(cond.isEmpty,
            "Conditional WHEN NOT MATCHED INSERT is not supported")
          insertNotMatched = true
      }
    }
    if (sawAny && matchedClauses.result().isEmpty && bySourceClauses.result().isEmpty
        && !insertNotMatched)
      throw new IllegalArgumentException(s"Unsupported MERGE clause: $clauses")
    val matched =
      // legacy default: a bare MERGE (no clauses) upserts
      if (!sawAny) Seq(DeltaDml.MatchedClause(DeltaDml.WhenMatched.UpdateAll))
      else matchedClauses.result()
    val r = DeltaDml.mergeClauses(spark, targetPath, source, keys,
      matched = matched,
      insertNotMatched = !sawAny || insertNotMatched,
      bySource = bySourceClauses.result(),
      schemaEvolution = schemaEvolution)
    oneRow(spark,
      Seq("operation", "matchedRows", "insertedRows", "removedFiles", "addedFiles"),
      Row("MERGE", r.matchedRows, r.insertedRows, r.removedFiles, r.addedFiles))
  }

  /** Row count the write itself committed (commitInfo numOutputRows) —
    * re-running the source query just to report a count would double
    * its cost. */
  private def committedRows(spark: SparkSession, path: String, v: Long): Long =
    DeltaLog.forTable(spark, path).commitInfoOf(v)
      .flatMap(_.operationMetrics.get("numOutputRows")).map(_.toLong).getOrElse(-1L)

  /** Resolve a MERGE source: a Delta table dir, a parquet path, or a
    * catalog/temp-view name. */
  private def sourceFrame(spark: SparkSession, ref: String): DataFrame = {
    val fsPath = new org.apache.hadoop.fs.Path(ref)
    val looksLikePath = ref.contains("/")
    if (looksLikePath) {
      val fs = fsPath.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(new org.apache.hadoop.fs.Path(fsPath, "_delta_log")))
        GraftDelta.readDelta(spark, ref)
      else spark.read.parquet(ref)
    } else spark.table(ref)
  }

  /** ON must be a conjunction of target.k = source.k equalities over the
    * SAME column name (the engine's equi-key merge contract). */
  private def equiKeysOf(
      spark: SparkSession, on: String,
      targetAlias: Option[String], sourceAlias: Option[String]): Seq[String] = {
    def nameOf(e: Expression): String = e match {
      case a: UnresolvedAttribute => a.nameParts.last
      case other => throw new IllegalArgumentException(
        s"Unsupported MERGE ON term: $other — need t.col = s.col equality")
    }
    def walk(e: Expression): Seq[String] = e match {
      case CAnd(l, r) => walk(l) ++ walk(r)
      case EqualTo(l, r) =>
        val (ln, rn) = (nameOf(l), nameOf(r))
        require(ln == rn,
          s"MERGE ON must join the same-named column on both sides, got $ln = $rn")
        Seq(ln)
      case other => throw new IllegalArgumentException(
        s"Unsupported MERGE ON clause: $other — need AND-ed equi-key equalities")
    }
    walk(spark.sessionState.sqlParser.parseExpression(on))
  }

  // ---- WHERE → DNF ------------------------------------------------------

  /** DML WHERE dispatch: Left(dnf) when the clause lowers to the DNF
    * predicate language (log-pruned path), Right(column) when it parses
    * but can't normalize (scan-side fallback — delta-spark would execute
    * these, so refusal would shrink the accepted surface for no
    * correctness gain). A clause Spark can't PARSE still throws. */
  private def nonDnfFallback(
      spark: SparkSession, where: Option[String],
      path: String): Either[Seq[Seq[Predicate]], org.apache.spark.sql.Column] =
    try Left(dnfOf(spark, where, colTypesOf(spark, path)))
    catch {
      case e: IllegalArgumentException if where.exists(_.trim.nonEmpty) =>
        // parse first so an unparseable WHERE surfaces ITS error, not the
        // DNF refusal
        spark.sessionState.sqlParser.parseExpression(where.get)
        logger.info(s"WHERE falls outside the DNF predicate language " +
          s"(${e.getMessage}); executing scan-side without log pruning")
        Right(expr(where.get))
    }

  /** Lower a SQL boolean expression to the engine's DNF predicate form.
    * The supported language is AND/OR trees over `col op literal`
    * (flipped literal-first comparisons normalize) plus the recognized
    * MONOTONE time-function conjuncts `year(col)`, `to_date(col)` /
    * `date(col)` / `CAST(col AS DATE)`, and `date_trunc(unit, col)`
    * compared to a literal — each rewrites to an EXACT range on the
    * underlying column (session-timezone aware), so the term both
    * prunes files at the log level and filters rows correctly. Anything
    * else — other functions, arithmetic, IS NULL, subqueries — refuses
    * loudly: the DNF drives log-level pruning AND the row filter, so a
    * silently dropped term would return wrong rows.
    *
    * `colType` resolves a column name to its table type (function
    * rewrites need it: a year() range over a DATE column carries Date
    * bounds, over a TIMESTAMP column instant bounds in the session
    * zone). The default resolves nothing, keeping plain-comparison
    * callers unchanged. */
  private[graft] def dnfOf(
      spark: SparkSession, where: Option[String],
      colType: String => Option[DataType] = _ => None): Seq[Seq[Predicate]] =
    where.map(_.trim).filter(_.nonEmpty) match {
      case None => Seq(Seq.empty)
      case Some(w) =>
        val zone = java.time.ZoneId.of(spark.sessionState.conf.sessionLocalTimeZone)
        toDnf(spark.sessionState.sqlParser.parseExpression(w), colType, zone)
    }

  private def toDnf(
      e: Expression, colType: String => Option[DataType],
      zone: java.time.ZoneId): Seq[Seq[Predicate]] = e match {
    case COr(l, r) => toDnf(l, colType, zone) ++ toDnf(r, colType, zone)
    case CAnd(l, r) =>
      for {
        a <- toDnf(l, colType, zone); b <- toDnf(r, colType, zone)
      } yield a ++ b
    case leaf => Seq(leafPredicates(leaf, colType, zone))
  }

  /** One leaf comparison → the conjunction of engine predicates it
    * lowers to (plain comparisons are a single predicate; recognized
    * time-function terms rewrite to up to two range bounds). */
  private def leafPredicates(
      e: Expression, colType: String => Option[DataType],
      zone: java.time.ZoneId): Seq[Predicate] = e match {
    case EqualTo(a: UnresolvedAttribute, l: Literal) => Seq(pred(a, "==", l))
    case EqualTo(l: Literal, a: UnresolvedAttribute) => Seq(pred(a, "==", l))
    case Not(EqualTo(a: UnresolvedAttribute, l: Literal)) => Seq(pred(a, "!=", l))
    case Not(EqualTo(l: Literal, a: UnresolvedAttribute)) => Seq(pred(a, "!=", l))
    case GreaterThan(a: UnresolvedAttribute, l: Literal) => Seq(pred(a, ">", l))
    case GreaterThan(l: Literal, a: UnresolvedAttribute) => Seq(pred(a, "<", l))
    case GreaterThanOrEqual(a: UnresolvedAttribute, l: Literal) => Seq(pred(a, ">=", l))
    case GreaterThanOrEqual(l: Literal, a: UnresolvedAttribute) => Seq(pred(a, "<=", l))
    case LessThan(a: UnresolvedAttribute, l: Literal) => Seq(pred(a, "<", l))
    case LessThan(l: Literal, a: UnresolvedAttribute) => Seq(pred(a, ">", l))
    case LessThanOrEqual(a: UnresolvedAttribute, l: Literal) => Seq(pred(a, "<=", l))
    case LessThanOrEqual(l: Literal, a: UnresolvedAttribute) => Seq(pred(a, ">=", l))
    case In(a: UnresolvedAttribute, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      Seq(Predicate(a.nameParts.last, "in",
        vs.map(v => scalaValue(v.asInstanceOf[Literal]))))
    case Not(In(a: UnresolvedAttribute, vs)) if vs.forall(_.isInstanceOf[Literal]) =>
      Seq(Predicate(a.nameParts.last, "not in",
        vs.map(v => scalaValue(v.asInstanceOf[Literal]))))
    case EqualTo(TimeFnCall(fn, c), l: Literal) => timeFnRange(fn, c, "=", l, colType, zone)
    case EqualTo(l: Literal, TimeFnCall(fn, c)) => timeFnRange(fn, c, "=", l, colType, zone)
    case GreaterThan(TimeFnCall(fn, c), l: Literal) => timeFnRange(fn, c, ">", l, colType, zone)
    case GreaterThan(l: Literal, TimeFnCall(fn, c)) => timeFnRange(fn, c, "<", l, colType, zone)
    case GreaterThanOrEqual(TimeFnCall(fn, c), l: Literal) => timeFnRange(fn, c, ">=", l, colType, zone)
    case GreaterThanOrEqual(l: Literal, TimeFnCall(fn, c)) => timeFnRange(fn, c, "<=", l, colType, zone)
    case LessThan(TimeFnCall(fn, c), l: Literal) => timeFnRange(fn, c, "<", l, colType, zone)
    case LessThan(l: Literal, TimeFnCall(fn, c)) => timeFnRange(fn, c, ">", l, colType, zone)
    case LessThanOrEqual(TimeFnCall(fn, c), l: Literal) => timeFnRange(fn, c, "<=", l, colType, zone)
    case LessThanOrEqual(l: Literal, TimeFnCall(fn, c)) => timeFnRange(fn, c, ">=", l, colType, zone)
    case other => throw new IllegalArgumentException(
      s"Unsupported WHERE term for the Delta command surface: $other — " +
        "supported: col {=,!=,<,<=,>,>=} literal, col [NOT] IN (literals), " +
        "year|to_date|date|date_trunc over a column vs a literal, AND/OR")
  }

  private def pred(a: UnresolvedAttribute, op: String, l: Literal): Predicate =
    Predicate(a.nameParts.last, op, scalaValue(l))

  // ---- recognized time-function conjuncts -------------------------------

  private sealed trait TimeFn
  private case object YearFn extends TimeFn
  private case object ToDateFn extends TimeFn
  private final case class TruncFn(unit: String) extends TimeFn

  /** `year(col)` / `to_date(col)` / `date(col)` / `CAST(col AS DATE)` /
    * `date_trunc('unit', col)` over a bare column reference — the
    * monotone time extractions whose comparisons rewrite to exact
    * ranges on the column (the same function family the log-level
    * pruner's derived kernels understand). */
  private object TimeFnCall {
    def unapply(e: Expression): Option[(TimeFn, String)] = e match {
      case f: UnresolvedFunction =>
        (f.nameParts.map(_.toLowerCase), f.arguments) match {
          case (Seq("year"), Seq(a: UnresolvedAttribute)) =>
            Some((YearFn, a.nameParts.last))
          case (Seq("to_date") | Seq("date"), Seq(a: UnresolvedAttribute)) =>
            Some((ToDateFn, a.nameParts.last))
          case (Seq("date_trunc"), Seq(Literal(u: UTF8String, StringType), a: UnresolvedAttribute)) =>
            Some((TruncFn(u.toString.toLowerCase), a.nameParts.last))
          case _ => None
        }
      case c: Cast if c.dataType == DateType => c.child match {
        case a: UnresolvedAttribute => Some((ToDateFn, a.nameParts.last))
        case _ => None
      }
      case _ => None
    }
  }

  /** Rewrite `fn(col) op literal` to the EXACT equivalent range on
    * `col` — semantics-preserving, never a widening: the result drives
    * the row filter as well as pruning. Each extraction is a monotone
    * step function, so the preimage of a value is the half-open range
    * [lo, hi) and every comparison maps to range bounds; boundaries are
    * computed in the SESSION timezone (what Spark's own year/to_date/
    * date_trunc evaluate in) for timestamp columns, calendar-only for
    * date columns. Unknown column types and TIMESTAMP_NTZ refuse loudly
    * (NTZ wall-clock bounds would need the engine's predicate values to
    * carry zone-free semantics end-to-end). */
  private def timeFnRange(
      fn: TimeFn, column: String, op: String, l: Literal,
      colType: String => Option[DataType], zone: java.time.ZoneId): Seq[Predicate] = {
    import java.time.{DayOfWeek, Instant, LocalDate, ZonedDateTime}
    val dt0 = colType(column).getOrElse(throw new IllegalArgumentException(
      s"Cannot rewrite a time-function WHERE term on '$column': not a column " +
        "of the target table"))
    // TIMESTAMP_NTZ is zone-free wall clock; the engine's predicate
    // convention (scalaValue, stats encoding, d37) carries NTZ instants
    // as UTC-wall-clock java.sql.Timestamps — same rewrite, UTC bounds
    val (dt, effZone) = dt0 match {
      case TimestampNTZType => (TimestampType, java.time.ZoneOffset.UTC: java.time.ZoneId)
      case other => (other, zone)
    }
    def tsOf(z: ZonedDateTime) = java.sql.Timestamp.from(z.toInstant)
    // fn(col) op v where fn's preimage of v is [lo, hi)
    def range(lo: Any, hi: Any): Seq[Predicate] = op match {
      case "=" => Seq(Predicate(column, ">=", lo), Predicate(column, "<", hi))
      case ">=" => Seq(Predicate(column, ">=", lo))
      case ">" => Seq(Predicate(column, ">=", hi))
      case "<" => Seq(Predicate(column, "<", lo))
      case "<=" => Seq(Predicate(column, "<", hi))
      case other => throw new IllegalArgumentException(
        s"Unsupported op for a time-function WHERE term: $other")
    }
    fn match {
      case YearFn =>
        val n = l.value match {
          case i: Number => i.intValue()
          case other => throw new IllegalArgumentException(
            s"year($column) compares to a non-integer literal: $other")
        }
        dt match {
          case DateType => range(
            java.sql.Date.valueOf(LocalDate.of(n, 1, 1)),
            java.sql.Date.valueOf(LocalDate.of(n + 1, 1, 1)))
          case TimestampType => range(
            tsOf(ZonedDateTime.of(n, 1, 1, 0, 0, 0, 0, effZone)),
            tsOf(ZonedDateTime.of(n + 1, 1, 1, 0, 0, 0, 0, effZone)))
          case other => throw new IllegalArgumentException(
            s"year($column) rewrite needs a DATE or TIMESTAMP column, found $other")
        }
      case ToDateFn =>
        val d = (l.value, l.dataType) match {
          case (days: Integer, DateType) => LocalDate.ofEpochDay(days.toLong)
          case (s: UTF8String, StringType) => LocalDate.parse(s.toString.trim)
          case (v, t) => throw new IllegalArgumentException(
            s"to_date($column) compares to a non-date literal: $v ($t)")
        }
        dt match {
          // identity on a DATE column: the comparison passes through
          case DateType =>
            val eng = if (op == "=") "==" else op
            Seq(Predicate(column, eng, java.sql.Date.valueOf(d)))
          case TimestampType => range(
            tsOf(d.atStartOfDay(effZone)),
            tsOf(d.plusDays(1).atStartOfDay(effZone)))
          case other => throw new IllegalArgumentException(
            s"to_date($column) rewrite needs a DATE or TIMESTAMP column, found $other")
        }
      case TruncFn(unit) =>
        require(dt == TimestampType,
          s"date_trunc rewrite needs a TIMESTAMP column, found $dt for '$column'")
        val zl: ZonedDateTime = (l.value, l.dataType) match {
          case (micros: java.lang.Long, TimestampType) =>
            Instant.ofEpochSecond(
              Math.floorDiv(micros, 1000000L),
              Math.floorMod(micros, 1000000L) * 1000L).atZone(effZone)
          case (s: UTF8String, StringType) =>
            // a bare string literal coerces as a session-zone wall clock,
            // matching Spark's own TIMESTAMP coercion in the comparison
            val t = s.toString.trim.replace("T", " ")
            val padded = if (t.contains(" ")) t else t + " 00:00:00"
            java.sql.Timestamp.valueOf(padded).toLocalDateTime.atZone(effZone)
          case (v, t) => throw new IllegalArgumentException(
            s"date_trunc(..., $column) compares to a non-timestamp literal: $v ($t)")
        }
        import java.time.temporal.ChronoUnit.{DAYS, HOURS, MINUTES}
        def floorU(z: ZonedDateTime): ZonedDateTime = unit match {
          case "year" | "yyyy" | "yy" => z.truncatedTo(DAYS).withDayOfYear(1)
          case "quarter" =>
            val m = z.truncatedTo(DAYS).withDayOfMonth(1)
            m.withMonth((m.getMonthValue - 1) / 3 * 3 + 1)
          case "month" | "mon" | "mm" => z.truncatedTo(DAYS).withDayOfMonth(1)
          case "week" => z.truncatedTo(DAYS).`with`(
            java.time.temporal.TemporalAdjusters.previousOrSame(DayOfWeek.MONDAY))
          case "day" | "dd" => z.truncatedTo(DAYS)
          case "hour" => z.truncatedTo(HOURS)
          case "minute" => z.truncatedTo(MINUTES)
          case other => throw new IllegalArgumentException(
            s"Unsupported date_trunc unit for the WHERE rewrite: $other")
        }
        def nextU(z: ZonedDateTime): ZonedDateTime = unit match {
          case "year" | "yyyy" | "yy" => z.plusYears(1)
          case "quarter" => z.plusMonths(3)
          case "month" | "mon" | "mm" => z.plusMonths(1)
          case "week" => z.plusWeeks(1)
          case "day" | "dd" => z.plusDays(1)
          case "hour" => z.plusHours(1)
          case "minute" => z.plusMinutes(1)
          case other => throw new IllegalArgumentException(
            s"Unsupported date_trunc unit for the WHERE rewrite: $other")
        }
        val f = floorU(zl)
        val aligned = f.toInstant == zl.toInstant
        val nx = nextU(f)
        op match {
          // an unaligned literal can never equal a truncated value — the
          // term is identically false, expressed as a contradictory range
          case "=" =>
            if (aligned) range(tsOf(f), tsOf(nx))
            else Seq(Predicate(column, "<", tsOf(f)), Predicate(column, ">", tsOf(f)))
          case ">=" => Seq(Predicate(column, ">=", tsOf(if (aligned) f else nx)))
          case ">" => Seq(Predicate(column, ">=", tsOf(nx)))
          case "<" => Seq(Predicate(column, "<", tsOf(if (aligned) f else nx)))
          case "<=" => Seq(Predicate(column, "<", tsOf(nx)))
          case other => throw new IllegalArgumentException(
            s"Unsupported op for a time-function WHERE term: $other")
        }
    }
  }

  /** Column-type lookup against the table's CURRENT schema, loaded
    * lazily — plain-comparison WHEREs never touch the log for it. */
  private[graft] def colTypesOf(spark: SparkSession, path: String): String => Option[DataType] = {
    lazy val schema = DeltaLog.forTable(spark, path).snapshot(None).schema
    name => schema.fields.find(_.name.equalsIgnoreCase(name)).map(_.dataType)
  }

  /** Catalyst literal → the plain-Scala value the engine's predicate
    * evaluator and Column lowering expect. */
  private def scalaValue(l: Literal): Any = (l.value, l.dataType) match {
    case (null, _) => null
    case (u: UTF8String, _) => u.toString
    case (d: org.apache.spark.sql.types.Decimal, _) => d.toBigDecimal
    case (days: Integer, DateType) =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(days.toLong))
    case (micros: java.lang.Long, TimestampType) => microsToTimestamp(micros)
    case (micros: java.lang.Long, _: TimestampNTZType.type) => microsToTimestamp(micros)
    case (v, _) => v
  }

  /** Micros → java.sql.Timestamp at full precision with floor semantics:
    * truncating division (`micros / 1000L`) rounds pre-1970 values
    * toward zero — a pre-epoch WHERE literal lands 1 ms late and can
    * flip boundary comparisons in pruning and row filters. floorDiv for
    * the millis plus setNanos for the sub-millisecond remainder keeps
    * the exact instant. */
  private def microsToTimestamp(micros: Long): java.sql.Timestamp = {
    val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000L))
    ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
    ts
  }

  // ---- assignments ------------------------------------------------------

  /** Split `a = e1, b = e2` on depth-0 commas (parens and quotes nest). */
  private[sql] def splitAssignments(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var inStr: Option[Char] = None; var start = 0
    s.zipWithIndex.foreach { case (c, i) =>
      inStr match {
        case Some(q) => if (c == q) inStr = None
        case None => c match {
          case '\'' | '"' => inStr = Some(c)
          case '(' => depth += 1
          case ')' => depth -= 1
          case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
          case _ => ()
        }
      }
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private def splitOnce(assign: String): (String, String) = {
    val i = assign.indexOf('=')
    require(i > 0, s"Malformed assignment: $assign")
    (assign.substring(0, i).trim.stripPrefix("`").stripSuffix("`"),
      assign.substring(i + 1).trim)
  }

  private def assignmentsOf(setClause: String): Map[String, Column] =
    splitAssignments(setClause).map { a =>
      val (name, e) = splitOnce(a)
      name -> expr(e)
    }.toMap

  // ---- result frames ----------------------------------------------------

  private def dmlFrame(spark: SparkSession, op: String, r: DeltaDml.DmlResult): DataFrame =
    oneRow(spark,
      Seq("operation", "affectedRows", "removedFiles", "rewrittenFiles", "addedFiles"),
      Row(op, r.affectedRows, r.removedFiles, r.rewrittenFiles, r.addedFiles))

  private def oneRow(spark: SparkSession, names: Seq[String], row: Row): DataFrame = {
    val fields = names.zip(row.toSeq).map {
      case (n, _: String) => StructField(n, StringType)
      case (n, _: Long) => StructField(n, LongType)
      case (n, _: Int) => StructField(n, IntegerType)
      case (n, _: Boolean) => StructField(n, BooleanType)
      case (n, _) => StructField(n, StringType)
    }
    spark.createDataFrame(
      java.util.Collections.singletonList(row), StructType(fields))
  }
}
