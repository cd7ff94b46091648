package graft.delta

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fluent table handle mirroring the public delta-spark `DeltaTable`
  * surface (`io.delta.tables.DeltaTable`: forPath/forName/isDeltaTable,
  * toDF, history/detail, vacuum, delete/updateExpr, a merge builder,
  * optimize, restore), lowered onto the SAME engine paths as the
  * functional `GraftDelta` API and the SQL command surface — no second
  * code path. Condition and assignment strings route through the
  * GraftSql statement surface, so the DNF lowering, time-function range
  * rewrites, loud refusals, and log-level pruning are identical however
  * the user addresses the table. Divergence kept on purpose: no
  * conditionless `delete()`/`update()` — the engine refuses implicit
  * full-table DML everywhere (`DeltaDml`), and the facade does not
  * reopen that door.
  *
  * Reference analog: the reference exposes free functions only
  * (`read_delta`/`to_delta`/`vacuum`/`read_delta_history`, core.py);
  * this handle is beyond-parity ergonomics for delta-spark migrants. */
final class GraftTable private (spark: SparkSession, val path: String) {

  private def sqlRef = s"delta.`$path`"
  private def cmd(statement: String): DataFrame =
    graft.sql.GraftSql.sql(spark, statement)

  /** The table's latest snapshot as a DataFrame. */
  def toDF: DataFrame = GraftDelta.readDelta(spark, path)

  /** Time travel to a version / timestamp. */
  def asOf(version: Long): DataFrame =
    GraftDelta.readDelta(spark, path, version = Some(version))
  def asOfTimestamp(ts: String): DataFrame =
    GraftDelta.readDelta(spark, path, timestamp = Some(ts))

  def history(): DataFrame = GraftDelta.readDeltaHistory(spark, path, None)
  def history(limit: Int): DataFrame =
    GraftDelta.readDeltaHistory(spark, path, Some(limit))
  def detail(): DataFrame = GraftDelta.tableDetail(spark, path)

  def vacuum(retentionHours: Double = 168.0, dryRun: Boolean = false): Seq[String] =
    GraftDelta.vacuum(spark, path, retentionHours, dryRun)

  /** DELETE rows matching `condition` (engine DNF + recognized
    * time-function conjuncts; unsupported shapes refuse loudly). */
  def delete(condition: String): DataFrame =
    cmd(s"DELETE FROM $sqlRef WHERE $condition")

  /** UPDATE SET (column -> expression strings) WHERE `condition`. */
  def updateExpr(condition: String, set: Map[String, String]): DataFrame = {
    require(set.nonEmpty, "updateExpr requires at least one assignment")
    val assignments = set.map { case (k, v) => s"$k = $v" }.mkString(", ")
    cmd(s"UPDATE $sqlRef SET $assignments WHERE $condition")
  }

  /** Merge builder over a DataFrame source and equi-key ON columns (the
    * engine's merge contract: target.k = source.k per key). */
  def merge(source: DataFrame, on: Seq[String]): GraftMergeBuilder =
    new GraftMergeBuilder(spark, path, source, on)

  def optimize(): GraftOptimizeBuilder = new GraftOptimizeBuilder(spark, path)

  def restoreToVersion(version: Long): DataFrame =
    cmd(s"RESTORE TABLE $sqlRef TO VERSION AS OF $version")
  def restoreToTimestamp(ts: String): DataFrame =
    cmd(s"RESTORE TABLE $sqlRef TO TIMESTAMP AS OF '$ts'")

  def addCheckConstraint(name: String, check: String): DataFrame =
    cmd(s"ALTER TABLE $sqlRef ADD CONSTRAINT $name CHECK ($check)")
  def dropConstraint(name: String): DataFrame =
    cmd(s"ALTER TABLE $sqlRef DROP CONSTRAINT $name")

  /** GENERATE mode — only `symlink_format_manifest` exists (Presto/
    * Trino/Athena interop); returns the manifest count. */
  def generate(mode: String): Long = {
    require(mode.equalsIgnoreCase("symlink_format_manifest"),
      s"Unknown GENERATE mode '$mode' — supported: symlink_format_manifest")
    DeltaTableOps.generateSymlinkManifest(spark, path)
  }

  /** Raise the protocol version floor (no downgrades). */
  def upgradeTableProtocol(minReader: Int, minWriter: Int): Long =
    DeltaTableOps.upgradeTableProtocol(spark, path, minReader, minWriter)

  /** Liquid clustering: store clustering columns; subsequent
    * `optimize().executeCompaction()` lays data out by them. */
  def clusterBy(columns: String*): Long =
    DeltaTableOps.clusterBy(spark, path, columns)

  /** Type widening (metadata-only): old narrow files widen on read. */
  def widenColumnType(column: String,
      newType: org.apache.spark.sql.types.DataType): Long =
    DeltaTableOps.widenColumnType(spark, path, column, newType)

  /** Explicit full-table delete: tombstones every active file in one
    * commit; schema, history, and pre-truncate time travel survive.
    * The only conditionless row-removing surface on the handle. */
  def truncate(): DeltaTableOps.TruncateResult =
    DeltaTableOps.truncateTable(spark, path)

  /** Column default (allowColumnDefaults): constant expression filled
    * for the column by INSERTs that omit it. */
  def setColumnDefault(column: String, expr: String): Long =
    DeltaTableOps.setColumnDefault(spark, path, column, expr)

  def dropColumnDefault(column: String): Long =
    DeltaTableOps.dropColumnDefault(spark, path, column)

  /** Zero-copy metadata clone at `target` (optionally of a pinned
    * version) — the clone references this table's data files. */
  def shallowClone(target: String, version: Option[Long] = None): GraftTable = {
    GraftDelta.shallowClone(spark, path, target, version)
    new GraftTable(spark, target)
  }
}

/** Ordered clause accumulation, delta-spark builder style: each
  * `whenMatched*` call appends a clause (optional `condition` expression
  * string — target columns by name, source columns as `source.col` /
  * `s.col`), evaluated FIRST-MATCH-WINS; `whenNotMatchedBySource*`
  * clauses apply to target rows the source no longer carries;
  * `whenNotMatchedInsertAll()` opts into inserting unmatched source
  * rows (default: update-only merge). Only when NO clause method of any
  * kind was called does the builder keep its original upsert default
  * (UpdateAll); an insert-only merge leaves matched rows untouched. */
final class GraftMergeBuilder private[delta] (
    spark: SparkSession, path: String, source: DataFrame, on: Seq[String]) {
  private val matched = Seq.newBuilder[DeltaDml.MatchedClause]
  private val bySource = Seq.newBuilder[DeltaDml.BySourceClause]
  private var insertAll = false

  private def rewrite(e: String) =
    org.apache.spark.sql.functions.expr(
      e.replaceAll("(?i)\\b(?:source|s)\\.", "__graft_src_"))
  private def condOf(condition: String) = Option(condition).map(rewrite)

  def whenMatchedUpdateAll(condition: String = null): this.type = {
    matched += DeltaDml.MatchedClause(DeltaDml.WhenMatched.UpdateAll, condOf(condition))
    this
  }
  def whenMatchedDelete(condition: String = null): this.type = {
    matched += DeltaDml.MatchedClause(DeltaDml.WhenMatched.Delete, condOf(condition))
    this
  }

  /** UPDATE SET with expression strings; `source.col` / `s.col` refer to
    * the merge source's columns (same rewrite as the SQL surface). */
  def whenMatchedUpdateExpr(set: Map[String, String], condition: String = null): this.type = {
    require(set.nonEmpty, "whenMatchedUpdateExpr requires at least one assignment")
    matched += DeltaDml.MatchedClause(
      DeltaDml.WhenMatched.Update(set.map { case (k, v) => k -> rewrite(v) }),
      condOf(condition))
    this
  }

  def whenNotMatchedInsertAll(): this.type = { insertAll = true; this }

  def whenNotMatchedBySourceDelete(condition: String = null): this.type = {
    bySource += DeltaDml.BySourceClause(DeltaDml.BySourceAction.Delete, condOf(condition))
    this
  }
  /** Assignments see target columns only (there is no source row). */
  def whenNotMatchedBySourceUpdateExpr(
      set: Map[String, String], condition: String = null): this.type = {
    require(set.nonEmpty, "whenNotMatchedBySourceUpdateExpr requires at least one assignment")
    bySource += DeltaDml.BySourceClause(
      DeltaDml.BySourceAction.Update(
        set.map { case (k, v) => k -> org.apache.spark.sql.functions.expr(v) }),
      condOf(condition))
    this
  }

  def execute(): DeltaDml.MergeResult = {
    val m = matched.result()
    // the legacy upsert default (UpdateAll) applies ONLY when no clause
    // method of any kind was called; an insert-only merge
    // (whenNotMatchedInsertAll alone) must leave matched rows untouched —
    // injecting UpdateAll there silently rewrites every matched row
    // (delta-spark builder semantics)
    val anyClause = m.nonEmpty || bySource.result().nonEmpty || insertAll
    DeltaDml.mergeClauses(spark, path, source, on,
      matched = if (!anyClause)
        Seq(DeltaDml.MatchedClause(DeltaDml.WhenMatched.UpdateAll)) else m,
      insertNotMatched = insertAll,
      bySource = bySource.result())
  }
}

/** OPTIMIZE builder: optional partition predicate, compaction or
  * Z-order execution. */
final class GraftOptimizeBuilder private[delta] (spark: SparkSession, path: String) {
  private var predicate: Option[String] = None

  def where(partitionFilter: String): this.type = {
    predicate = Some(partitionFilter); this
  }

  private def run(zorder: Seq[String]): DataFrame = {
    val w = predicate.map(p => s" WHERE $p").getOrElse("")
    val z = if (zorder.isEmpty) "" else s" ZORDER BY (${zorder.mkString(", ")})"
    graft.sql.GraftSql.sql(spark, s"OPTIMIZE delta.`$path`$w$z")
  }
  def executeCompaction(): DataFrame = run(Nil)
  def executeZOrderBy(columns: String*): DataFrame = {
    require(columns.nonEmpty, "executeZOrderBy requires at least one column")
    run(columns)
  }
}

object GraftTable {
  /** Handle for the Delta table at `path`; refuses non-tables loudly. */
  def forPath(spark: SparkSession, path: String): GraftTable = {
    require(isDeltaTable(spark, path),
      s"$path is not a Delta table (no _delta_log with commits)")
    new GraftTable(spark, path)
  }

  /** Handle for a catalog-named graft table (`CREATE TABLE … USING graft
    * LOCATION …`) — resolves through the session catalog to the same
    * path-addressed handle. */
  def forName(spark: SparkSession, name: String): GraftTable = {
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(name)
    val meta = spark.sessionState.catalog.getTableMetadata(ident)
    forPath(spark, new org.apache.hadoop.fs.Path(meta.location).toString)
  }

  def isDeltaTable(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path, "_delta_log")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(p) && fs.listStatus(p).exists { st =>
      val n = st.getPath.getName
      n.endsWith(".json") || n.contains(".checkpoint")
    }
  }

  def convertToDelta(spark: SparkSession, path: String): GraftTable = {
    GraftDelta.convertToDelta(spark, path)
    new GraftTable(spark, path)
  }
}
