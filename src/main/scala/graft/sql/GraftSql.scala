package graft.sql

import graft.delta._
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And => CAnd, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal, Not, Or => COr}
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
  *   - MERGE INTO t USING s ON cond [WHEN MATCHED THEN UPDATE SET *|DELETE]
  *     [WHEN NOT MATCHED THEN INSERT *]
  *   - OPTIMIZE t [WHERE p] [ZORDER BY (a, b)]
  *   - VACUUM t [RETAIN n HOURS] [DRY RUN]
  *   - RESTORE [TABLE] t TO VERSION AS OF n | TO TIMESTAMP AS OF 'ts'
  *   - DESCRIBE HISTORY t [LIMIT n]  /  DESCRIBE DETAIL t
  *   - ALTER TABLE t ADD CONSTRAINT name CHECK (e)  /  DROP CONSTRAINT name
  *   - CONVERT TO DELTA parquet.`/path`
  *
  * WHERE clauses parse through Spark's own expression parser and lower
  * to the engine's DNF predicate form; the supported shape is any
  * AND/OR tree over `col op literal` comparisons (op ∈ =, !=, <, <=,
  * >, >=, IN, NOT IN) — the same language the log-level pruner
  * understands, so every SQL predicate prunes files before any scan.
  * Unsupported WHERE shapes refuse loudly rather than scanning wrong.
  *
  * Command results come back as one-row DataFrames of the operation's
  * metrics (or the history/detail/vacuum row sets), so callers can
  * compose them like any query result.
  */
object GraftSql {

  // table reference: delta.`p` | graft.`p` | `p` | 'p' | bare-token
  private val Ref = """(?:(?:delta|graft)\.)?(?:`([^`]+)`|'([^']+)'|([^\s`';]+))"""
  private def refOf(m: Regex.Match, g: Int): String =
    Seq(m.group(g), m.group(g + 1), m.group(g + 2)).find(_ != null).get

  private val DvHint = """(?is)/\*\+\s*DV\s*\*/"""

  private val DeleteRe =
    s"""(?is)^\\s*DELETE\\s+FROM\\s+$Ref\\s*(?:WHERE\\s+(.+?))?\\s*;?\\s*$$""".r
  private val UpdateRe =
    s"""(?is)^\\s*UPDATE\\s+$Ref\\s+SET\\s+(.+?)\\s*(?:\\bWHERE\\s+(.+?))?\\s*;?\\s*$$""".r
  private val MergeRe =
    (s"""(?is)^\\s*MERGE\\s+INTO\\s+$Ref(?:\\s+AS\\s+(\\w+))?\\s+USING\\s+$Ref""" +
      s"""(?:\\s+AS\\s+(\\w+))?\\s+ON\\s+(.+?)((?:\\s+WHEN\\s+.+?)?)\\s*;?\\s*$$""").r
  private val OptimizeRe =
    (s"""(?is)^\\s*OPTIMIZE\\s+$Ref\\s*(?:WHERE\\s+(.+?))?""" +
      s"""\\s*(?:ZORDER\\s+BY\\s*\\(?\\s*([\\w,\\s`]+?)\\s*\\)?)?\\s*;?\\s*$$""").r
  private val VacuumRe =
    (s"""(?is)^\\s*VACUUM\\s+$Ref""" +
      s"""\\s*(?:RETAIN\\s+([0-9.]+)\\s+HOURS?)?\\s*(DRY\\s+RUN)?\\s*;?\\s*$$""").r
  private val RestoreVersionRe =
    s"""(?is)^\\s*RESTORE\\s+(?:TABLE\\s+)?$Ref\\s+TO\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)\\s*;?\\s*$$""".r
  private val RestoreTimestampRe =
    s"""(?is)^\\s*RESTORE\\s+(?:TABLE\\s+)?$Ref\\s+TO\\s+TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)'\\s*;?\\s*$$""".r
  private val HistoryRe =
    s"""(?is)^\\s*DESCRIBE\\s+HISTORY\\s+$Ref\\s*(?:LIMIT\\s+(\\d+))?\\s*;?\\s*$$""".r
  private val DetailRe =
    s"""(?is)^\\s*DESCRIBE\\s+DETAIL\\s+$Ref\\s*;?\\s*$$""".r
  private val AddConstraintRe =
    (s"""(?is)^\\s*ALTER\\s+TABLE\\s+$Ref\\s+ADD\\s+CONSTRAINT\\s+(\\w+)""" +
      s"""\\s+CHECK\\s*\\((.+)\\)\\s*;?\\s*$$""").r
  private val DropConstraintRe =
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$Ref\\s+DROP\\s+CONSTRAINT\\s+(\\w+)\\s*;?\\s*$$""".r
  private val ConvertRe =
    s"""(?is)^\\s*CONVERT\\s+TO\\s+DELTA\\s+(?:parquet\\.)?(?:`([^`]+)`|'([^']+)'|([^\\s`';]+))\\s*;?\\s*$$""".r
  private val RenameColumnRe =
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$Ref\\s+RENAME\\s+COLUMN\\s+`?(\\w+)`?\\s+TO\\s+`?(\\w+)`?\\s*;?\\s*$$""".r
  private val DropColumnRe =
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$Ref\\s+DROP\\s+COLUMN\\s+`?(\\w+)`?\\s*;?\\s*$$""".r
  private val SetPropsRe =
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$Ref\\s+SET\\s+TBLPROPERTIES\\s*\\((.+)\\)\\s*;?\\s*$$""".r
  private val CloneRe =
    (s"""(?is)^\\s*CREATE\\s+(?:OR\\s+REPLACE\\s+)?TABLE\\s+$Ref\\s+SHALLOW\\s+CLONE\\s+$Ref""" +
      s"""(?:\\s+VERSION\\s+AS\\s+OF\\s+(\\d+))?\\s*;?\\s*$$""").r
  private val InsertRe =
    s"""(?is)^\\s*INSERT\\s+(INTO|OVERWRITE)\\s+(?:TABLE\\s+)?$Ref\\s+(SELECT\\s+.+|VALUES\\s+.+|TABLE\\s+.+)\\s*;?\\s*$$""".r
  private val CtasRe =
    (s"""(?is)^\\s*CREATE\\s+TABLE\\s+$Ref""" +
      s"""(?:\\s+PARTITIONED\\s+BY\\s*\\(([\\w,\\s`]+)\\))?\\s+AS\\s+(SELECT\\s+.+)\\s*;?\\s*$$""").r

  def sql(spark: SparkSession, statement: String): DataFrame = {
    val useDv = DvHint.r.findFirstIn(statement).isDefined
    val stmt = statement.replaceAll(DvHint, " ")
    stmt match {
      case DeleteRe(p1, p2, p3, where) =>
        val path = Seq(p1, p2, p3).find(_ != null).get
        val filters = dnfOf(spark, Option(where))
        val r = if (useDv) GraftDelta.deleteWhereWithDv(spark, path, filters)
                else GraftDelta.deleteWhere(spark, path, filters)
        dmlFrame(spark, "DELETE", r)
      case UpdateRe(p1, p2, p3, setClause, where) =>
        val path = Seq(p1, p2, p3).find(_ != null).get
        val set = assignmentsOf(setClause)
        val filters = dnfOf(spark, Option(where))
        val r = if (useDv) GraftDelta.updateWhereWithDv(spark, path, filters, set)
                else GraftDelta.updateWhere(spark, path, filters, set)
        dmlFrame(spark, "UPDATE", r)
      case s if MergeRe.pattern.matcher(s).matches() =>
        runMerge(spark, MergeRe.findFirstMatchIn(s).get)
      case OptimizeRe(p1, p2, p3, where, zorderCols) =>
        val path = Seq(p1, p2, p3).find(_ != null).get
        val filters = dnfOf(spark, Option(where))
        val sortBy = Option(zorderCols).toSeq
          .flatMap(_.split(",")).map(_.trim.stripPrefix("`").stripSuffix("`"))
          .filter(_.nonEmpty)
        val (before, after) = DeltaMaintenance.compact(spark, path,
          sortBy = sortBy, zorder = sortBy.size >= 2, where = filters)
        oneRow(spark, Seq("operation", "filesBefore", "filesAfter"),
          Row("OPTIMIZE", before, after))
      case VacuumRe(p1, p2, p3, hours, dry) =>
        val path = Seq(p1, p2, p3).find(_ != null).get
        val retention = Option(hours).map(_.toDouble).getOrElse(168.0)
        val deleted = GraftDelta.vacuum(spark, path, retention, dryRun = dry != null)
        import spark.implicits._
        deleted.toDF("path")
      case RestoreVersionRe(p1, p2, p3, v) =>
        val path = Seq(p1, p2, p3).find(_ != null).get
        val r = GraftDelta.restore(spark, path, v.toLong)
        oneRow(spark, Seq("operation", "tableVersion", "restoredToVersion"),
          Row("RESTORE", r.tableVersion, v.toLong))
      case RestoreTimestampRe(p1, p2, p3, ts) =>
        val path = Seq(p1, p2, p3).find(_ != null).get
        val millis = java.sql.Timestamp.valueOf(ts.replace("T", " ")).getTime
        val target = DeltaLog.forTable(spark, path).versionAtOrBefore(millis)
        val r = GraftDelta.restore(spark, path, target)
        oneRow(spark, Seq("operation", "tableVersion", "restoredToVersion"),
          Row("RESTORE", r.tableVersion, target))
      case HistoryRe(p1, p2, p3, limit) =>
        val path = Seq(p1, p2, p3).find(_ != null).get
        GraftDelta.readDeltaHistory(spark, path, Option(limit).map(_.toInt))
      case DetailRe(p1, p2, p3) =>
        GraftDelta.tableDetail(spark, Seq(p1, p2, p3).find(_ != null).get)
      case AddConstraintRe(p1, p2, p3, name, check) =>
        val path = Seq(p1, p2, p3).find(_ != null).get
        val r = GraftDelta.addCheckConstraint(spark, path, name, check)
        oneRow(spark, Seq("operation", "tableVersion", "constraint"),
          Row("ADD CONSTRAINT", r.tableVersion, name))
      case DropConstraintRe(p1, p2, p3, name) =>
        val path = Seq(p1, p2, p3).find(_ != null).get
        val r = GraftDelta.dropConstraint(spark, path, name)
        oneRow(spark, Seq("operation", "tableVersion", "constraint"),
          Row("DROP CONSTRAINT", r.tableVersion, name))
      case RenameColumnRe(p1, p2, p3, from, to) =>
        val path = Seq(p1, p2, p3).find(_ != null).get
        val r = GraftDelta.renameColumn(spark, path, from, to)
        oneRow(spark, Seq("operation", "tableVersion"),
          Row("RENAME COLUMN", r.tableVersion))
      case DropColumnRe(p1, p2, p3, colName) =>
        val path = Seq(p1, p2, p3).find(_ != null).get
        val r = GraftDelta.dropColumn(spark, path, colName)
        oneRow(spark, Seq("operation", "tableVersion"),
          Row("DROP COLUMN", r.tableVersion))
      case SetPropsRe(p1, p2, p3, propList) =>
        val path = Seq(p1, p2, p3).find(_ != null).get
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
      case CloneRe(t1, t2, t3, s1, s2, s3, v) =>
        val target = Seq(t1, t2, t3).find(_ != null).get
        val source = Seq(s1, s2, s3).find(_ != null).get
        val r = GraftDelta.shallowClone(spark, source, target,
          Option(v).map(_.toLong))
        oneRow(spark, Seq("operation", "tableVersion", "clonedFiles"),
          Row("SHALLOW CLONE", r.tableVersion, r.clonedFiles))
      case InsertRe(kind, p1, p2, p3, query) =>
        val path = Seq(p1, p2, p3).find(_ != null).get
        val raw = spark.sql(rewriteDeltaRefs(spark,
          if (query.trim.toUpperCase.startsWith("VALUES")) s"SELECT * FROM ($query)"
          else query))
        // SQL INSERT binds columns by POSITION against the table schema
        val target = DeltaLog.forTable(spark, path).snapshot(None).schema
        require(raw.columns.length == target.fields.length,
          s"INSERT arity mismatch: query returns ${raw.columns.length} columns, " +
            s"table has ${target.fields.length}")
        val frame = raw.toDF(target.fieldNames.toIndexedSeq: _*)
          .select(target.fields.map(f =>
            org.apache.spark.sql.functions.col(f.name).cast(f.dataType)).toIndexedSeq: _*)
        val mode = if (kind.equalsIgnoreCase("OVERWRITE")) "overwrite" else "append"
        GraftDelta.toDelta(frame, path, mode = mode)
        val v = DeltaLog.forTable(spark, path).latestVersion
        oneRow(spark, Seq("operation", "tableVersion", "rows"),
          Row(s"INSERT ${kind.toUpperCase}", v, committedRows(spark, path, v)))
      case CtasRe(p1, p2, p3, partCols, query) =>
        val path = Seq(p1, p2, p3).find(_ != null).get
        val frame = spark.sql(rewriteDeltaRefs(spark, query))
        val partitionBy = Option(partCols).toSeq
          .flatMap(_.split(",")).map(_.trim.stripPrefix("`").stripSuffix("`"))
          .filter(_.nonEmpty)
        GraftDelta.toDelta(frame, path, partitionBy = partitionBy)
        oneRow(spark, Seq("operation", "tableVersion", "rows"),
          Row("CREATE TABLE AS SELECT", 0L, committedRows(spark, path, 0L)))
      case ConvertRe(p1, p2, p3) =>
        val path = Seq(p1, p2, p3).find(_ != null).get
        val r = GraftDelta.convertToDelta(spark, path)
        oneRow(spark, Seq("operation", "numFiles", "partitionColumns"),
          Row("CONVERT", r.numFiles, r.partitionColumns.mkString(",")))
      case s if CountStarRe.pattern.matcher(s).matches() =>
        metadataCount(spark, CountStarRe.findFirstMatchIn(s).get)
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
  private val CountStarRe =
    (s"""(?is)^\\s*SELECT\\s+COUNT\\s*\\(\\s*\\*\\s*\\)\\s*(?:AS\\s+(\\w+))?""" +
      s"""\\s+FROM\\s+$Ref\\s*(?:WHERE\\s+(.+?))?\\s*;?\\s*$$""").r

  private def metadataCount(spark: SparkSession, m: Regex.Match): Option[DataFrame] = {
    val alias = Option(m.group(1)).getOrElse("count(1)")
    val path = refOf(m, 2)
    val where = Option(m.group(5))
    try {
      val n = where.map(_.trim).filter(_.nonEmpty) match {
        case None =>
          val r = DeltaTableOps.statsAggregate(spark, path, Nil)
          r.df.select("n_rows").head().getLong(0)
        case Some(w) => DeltaTableOps.countWhere(spark, path, dnfOf(spark, Some(w))).count
      }
      Some(oneRow(spark, Seq(alias), Row(n)))
    } catch { case _: Exception => None } // not a graft table / non-DNF WHERE
  }

  // SELECT-side support: delta.`/path` table refs (with optional
  // VERSION/TIMESTAMP AS OF time travel) register as temp views over the
  // engine's reader, then the statement runs through spark.sql — the
  // full Spark SELECT surface over graft tables, time travel included.
  private val DeltaRefRe =
    ("""(?is)(?:delta|graft)\.`([^`]+)`""" +
      """(\s+VERSION\s+AS\s+OF\s+(\d+)|\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)')?""").r

  private def rewriteDeltaRefs(spark: SparkSession, statement: String): String =
    DeltaRefRe.replaceAllIn(statement, m => {
      val path = m.group(1)
      val version = Option(m.group(3)).map(_.toLong)
      val ts = Option(m.group(4))
      val view = "graft_ref_" + java.lang.Integer.toHexString(
        (path, version, ts).hashCode()).replace('-', '_')
      GraftDelta.readDelta(spark, path, version = version, timestamp = ts)
        .createOrReplaceTempView(view)
      Regex.quoteReplacement(view)
    })

  // ---- MERGE ------------------------------------------------------------

  private val WhenMatchedUpdateAllRe =
    """(?is)WHEN\s+MATCHED\s+(?:THEN\s+)?UPDATE\s+SET\s+\*""".r
  private val WhenMatchedUpdateRe =
    """(?is)WHEN\s+MATCHED\s+(?:THEN\s+)?UPDATE\s+SET\s+(.+?)(?=\s+WHEN\s+|\s*$)""".r
  private val WhenMatchedDeleteRe =
    """(?is)WHEN\s+MATCHED\s+(?:THEN\s+)?DELETE""".r
  private val WhenNotMatchedRe =
    """(?is)WHEN\s+NOT\s+MATCHED\s+(?:THEN\s+)?INSERT\s+\*""".r

  private def runMerge(spark: SparkSession, m: Regex.Match): DataFrame = {
    val targetPath = refOf(m, 1)
    val targetAlias = Option(m.group(4))
    val sourceRef = refOf(m, 5)
    val sourceAlias = Option(m.group(8))
    val onClause = m.group(9)
    val clauses = Option(m.group(10)).getOrElse("")

    val source = sourceFrame(spark, sourceRef)
    val keys = equiKeysOf(spark, onClause, targetAlias, sourceAlias)

    val whenMatched: DeltaDml.WhenMatched =
      if (WhenMatchedUpdateAllRe.findFirstIn(clauses).isDefined)
        DeltaDml.WhenMatched.UpdateAll
      else if (WhenMatchedDeleteRe.findFirstIn(clauses).isDefined)
        DeltaDml.WhenMatched.Delete
      else WhenMatchedUpdateRe.findFirstMatchIn(clauses) match {
        case Some(u) =>
          // source-column references (s.col / source.col) map to the
          // engine's src() marker columns
          val srcAliases = (sourceAlias.toSeq :+ "source").distinct
          val set = splitAssignments(u.group(1)).map { a =>
            val (name, raw) = splitOnce(a)
            val rewritten = srcAliases.foldLeft(raw)((e, al) =>
              e.replaceAll(s"(?i)\\b$al\\.", "__graft_src_"))
            name -> expr(rewritten)
          }.toMap
          DeltaDml.WhenMatched.Update(set)
        case None =>
          if (clauses.trim.isEmpty || WhenNotMatchedRe.findFirstIn(clauses).isDefined)
            DeltaDml.WhenMatched.UpdateAll
          else throw new IllegalArgumentException(
            s"Unsupported MERGE clause: $clauses — supported: UPDATE SET star, " +
              "UPDATE SET a=e, DELETE, WHEN NOT MATCHED [THEN] INSERT star")
      }
    val insertNotMatched =
      clauses.trim.isEmpty || WhenNotMatchedRe.findFirstIn(clauses).isDefined
    val r = GraftDelta.mergeInto(spark, targetPath, source, keys,
      whenMatched, insertNotMatched)
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

  /** Lower a SQL boolean expression to the engine's DNF predicate form.
    * The supported language is AND/OR trees over `col op literal`
    * (flipped literal-first comparisons normalize); anything else —
    * functions, arithmetic, IS NULL, subqueries — refuses loudly: the
    * DNF drives log-level pruning AND the row filter, so a silently
    * dropped term would return wrong rows. */
  private[sql] def dnfOf(spark: SparkSession, where: Option[String]): Seq[Seq[Predicate]] =
    where.map(_.trim).filter(_.nonEmpty) match {
      case None => Seq(Seq.empty)
      case Some(w) => toDnf(spark.sessionState.sqlParser.parseExpression(w))
    }

  private def toDnf(e: Expression): Seq[Seq[Predicate]] = e match {
    case COr(l, r) => toDnf(l) ++ toDnf(r)
    case CAnd(l, r) =>
      for { a <- toDnf(l); b <- toDnf(r) } yield a ++ b
    case leaf => Seq(Seq(leafPredicate(leaf)))
  }

  private def leafPredicate(e: Expression): Predicate = e match {
    case EqualTo(a: UnresolvedAttribute, l: Literal) => pred(a, "==", l)
    case EqualTo(l: Literal, a: UnresolvedAttribute) => pred(a, "==", l)
    case Not(EqualTo(a: UnresolvedAttribute, l: Literal)) => pred(a, "!=", l)
    case Not(EqualTo(l: Literal, a: UnresolvedAttribute)) => pred(a, "!=", l)
    case GreaterThan(a: UnresolvedAttribute, l: Literal) => pred(a, ">", l)
    case GreaterThan(l: Literal, a: UnresolvedAttribute) => pred(a, "<", l)
    case GreaterThanOrEqual(a: UnresolvedAttribute, l: Literal) => pred(a, ">=", l)
    case GreaterThanOrEqual(l: Literal, a: UnresolvedAttribute) => pred(a, "<=", l)
    case LessThan(a: UnresolvedAttribute, l: Literal) => pred(a, "<", l)
    case LessThan(l: Literal, a: UnresolvedAttribute) => pred(a, ">", l)
    case LessThanOrEqual(a: UnresolvedAttribute, l: Literal) => pred(a, "<=", l)
    case LessThanOrEqual(l: Literal, a: UnresolvedAttribute) => pred(a, ">=", l)
    case In(a: UnresolvedAttribute, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      Predicate(a.nameParts.last, "in",
        vs.map(v => scalaValue(v.asInstanceOf[Literal])))
    case Not(In(a: UnresolvedAttribute, vs)) if vs.forall(_.isInstanceOf[Literal]) =>
      Predicate(a.nameParts.last, "not in",
        vs.map(v => scalaValue(v.asInstanceOf[Literal])))
    case other => throw new IllegalArgumentException(
      s"Unsupported WHERE term for the Delta command surface: $other — " +
        "supported: col {=,!=,<,<=,>,>=} literal, col [NOT] IN (literals), AND/OR")
  }

  private def pred(a: UnresolvedAttribute, op: String, l: Literal): Predicate =
    Predicate(a.nameParts.last, op, scalaValue(l))

  /** Catalyst literal → the plain-Scala value the engine's predicate
    * evaluator and Column lowering expect. */
  private def scalaValue(l: Literal): Any = (l.value, l.dataType) match {
    case (null, _) => null
    case (u: UTF8String, _) => u.toString
    case (d: org.apache.spark.sql.types.Decimal, _) => d.toBigDecimal
    case (days: Integer, DateType) =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(days.toLong))
    case (micros: java.lang.Long, TimestampType) =>
      new java.sql.Timestamp(micros / 1000L)
    case (micros: java.lang.Long, _: TimestampNTZType.type) =>
      new java.sql.Timestamp(micros / 1000L)
    case (v, _) => v
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
      case (n, _) => StructField(n, StringType)
    }
    spark.createDataFrame(
      java.util.Collections.singletonList(row), StructType(fields))
  }
}
