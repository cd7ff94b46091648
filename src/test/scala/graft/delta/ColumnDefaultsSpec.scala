package graft.delta

import graft.sql.GraftSql
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Column defaults (writer feature `allowColumnDefaults`): SET DEFAULT
  * stamps CURRENT_DEFAULT field metadata + the feature in one
  * metadata-only commit, the SQL INSERT column-list surface fills
  * declared defaults for omitted columns (null for plain nullable ones,
  * loud refusal for non-nullable ones), DROP DEFAULT reverts to
  * null-fill, and constant-only validation refuses column references
  * and non-deterministic expressions. */
class ColumnDefaultsSpec extends GraftSuite {

  import TestBase.spark
  import spark.implicits._

  private def tmp(): String = {
    val d = Files.createTempDirectory("graft_defaults")
    d.toFile.deleteOnExit()
    s"$d/tbl"
  }

  test("SET DEFAULT is metadata-only, stamps the feature, and fills on INSERT") {
    val path = tmp()
    GraftDelta.toDelta(
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "v", "n"), path)      // v0
    val files0 = DeltaLog.forTable(spark, path).snapshot(None).activeFiles
      .map(_.path).toSet
    GraftSql.sql(spark,
      s"ALTER TABLE delta.`$path` ALTER COLUMN v SET DEFAULT 'NEW'")      // v1
    GraftSql.sql(spark,
      s"ALTER TABLE delta.`$path` ALTER COLUMN n SET DEFAULT 5 + 37")     // v2
    val snap = DeltaLog.forTable(spark, path).snapshot(None)
    assert(snap.activeFiles.map(_.path).toSet == files0, "metadata-only commits")
    assert(snap.protocol.writerFeatures.exists(_.contains("allowColumnDefaults")),
      s"feature must be stamped: ${snap.protocol}")
    assert(snap.protocol.minWriterVersion == 7)
    assert(DeltaTableOps.columnDefaultsOf(snap).toMap ==
      Map("v" -> "'NEW'", "n" -> "5 + 37"))
    // INSERT with a column list omitting v and n fills the defaults
    GraftSql.sql(spark,
      s"INSERT INTO delta.`$path` (k) VALUES (3), (4)")                   // v3
    val rows = GraftDelta.readDelta(spark, path)
      .orderBy("k").as[(Long, String, Long)].collect().toSeq
    assert(rows == Seq((1L, "a", 10L), (2L, "b", 20L),
      (3L, "NEW", 42L), (4L, "NEW", 42L)))
  }

  test("omitted columns without a default fill null; non-nullable refuse") {
    val path = tmp()
    GraftDelta.toDelta(Seq((1L, "a", 10L)).toDF("k", "v", "n"), path)
    GraftSql.sql(spark,
      s"INSERT INTO delta.`$path` (k, n) VALUES (2, 7)")
    val got = GraftDelta.readDelta(spark, path).where($"k" === 2L)
      .select($"v").collect().head
    assert(got.isNullAt(0), "omitted default-less nullable column fills null")

    // a NOT NULL column (foreign DDL shape) with no default refuses
    val p2 = tmp()
    GraftDelta.toDelta(Seq((1L, "a")).toDF("k", "v"), p2)
    val log = DeltaLog.forTable(spark, p2)
    val snap = log.snapshot(None)
    val tightened = org.apache.spark.sql.types.StructType(
      snap.schema.fields.map(f =>
        if (f.name == "v") f.copy(nullable = false) else f))
    log.writeCommit(1L, Seq(
      CommitInfo(System.currentTimeMillis(), "TIGHTEN"),
      snap.metadata.copy(schemaString = tightened.json)))
    val e = intercept[IllegalArgumentException](GraftSql.sql(spark,
      s"INSERT INTO delta.`$p2` (k) VALUES (9)"))
    assert(e.getMessage.contains("non-nullable"), e.getMessage)
  }

  test("DROP DEFAULT reverts to null-fill; feature stays on the protocol") {
    val path = tmp()
    GraftDelta.toDelta(Seq((1L, "a")).toDF("k", "v"), path)
    GraftSql.sql(spark, s"ALTER TABLE delta.`$path` ALTER COLUMN v SET DEFAULT 'D'")
    GraftSql.sql(spark, s"INSERT INTO delta.`$path` (k) VALUES (2)")
    GraftSql.sql(spark, s"ALTER TABLE delta.`$path` ALTER COLUMN v DROP DEFAULT")
    GraftSql.sql(spark, s"INSERT INTO delta.`$path` (k) VALUES (3)")
    val snap = DeltaLog.forTable(spark, path).snapshot(None)
    assert(DeltaTableOps.columnDefaultsOf(snap).isEmpty)
    assert(snap.protocol.writerFeatures.exists(_.contains("allowColumnDefaults")),
      "features never retract")
    val byK = GraftDelta.readDelta(spark, path).orderBy("k")
      .select($"v").collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(byK.toSeq == Seq("a", "D", null))
  }

  test("defaults must be constant, deterministic, and castable") {
    val path = tmp()
    GraftDelta.toDelta(Seq((1L, "a", 10L)).toDF("k", "v", "n"), path)
    val e1 = intercept[IllegalArgumentException](
      DeltaTableOps.setColumnDefault(spark, path, "n", "k + 1"))
    assert(e1.getMessage.contains("constant"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      DeltaTableOps.setColumnDefault(spark, path, "n", "rand()"))
    assert(e2.getMessage.contains("deterministic"), e2.getMessage)
    intercept[Exception](
      DeltaTableOps.setColumnDefault(spark, path, "n", "no_such_fn(1)"))
    // unknown column refuses
    intercept[IllegalArgumentException](
      DeltaTableOps.setColumnDefault(spark, path, "zzz", "1"))
    // uncastable constant refuses at declaration in BOTH dialects:
    // ANSI mode errors inside the probe; non-ANSI casts to NULL
    // silently, which the explicit null-production check catches
    // (accepting it would fill NULL where the user declared a default)
    val e3 = intercept[Exception](
      DeltaTableOps.setColumnDefault(spark, path, "n", "'abc'"))
    assert(e3.getMessage.contains("does not cast") ||
      e3.getMessage.contains("CAST_INVALID_INPUT"), e3.getMessage)
    val prevAnsi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val e4 = intercept[IllegalArgumentException](
        DeltaTableOps.setColumnDefault(spark, path, "n", "'abc'"))
      assert(e4.getMessage.contains("does not cast"), e4.getMessage)
    } finally spark.conf.set("spark.sql.ansi.enabled", prevAnsi)
    // a literal NULL default stays legal
    DeltaTableOps.setColumnDefault(spark, path, "n", "NULL")
  }

  test("TRUNCATE TABLE wipes rows, keeps schema/history/time-travel") {
    val path = tmp()
    GraftDelta.toDelta((1L to 20L).map(i => (i, s"v$i")).toDF("k", "v"), path) // v0
    val r = GraftSql.sql(spark, s"TRUNCATE TABLE delta.`$path`")
    assert(r.select("deletedRows").head().getLong(0) == 20L)
    assert(r.select("removedFiles").head().getLong(0) >= 1L)
    assert(GraftDelta.readDelta(spark, path).count() == 0L)
    val snap = DeltaLog.forTable(spark, path).snapshot(None)
    assert(snap.version == 1L && snap.schema.fieldNames.toSeq == Seq("k", "v"))
    // pre-truncate versions still read
    assert(GraftDelta.readDelta(spark, path, version = Some(0L)).count() == 20L)
    // truncating the already-empty table is a no-op (no new commit)
    val r2 = DeltaTableOps.truncateTable(spark, path)
    assert(r2.tableVersion == 1L && r2.removedRows == 0L)
    // an append after truncate starts fresh
    GraftDelta.toDelta(Seq((99L, "z")).toDF("k", "v"), path, mode = "append")
    assert(GraftDelta.readDelta(spark, path).count() == 1L)
  }

  test("TRUNCATE on a CDF table records every dropped row as a cdc delete") {
    import org.apache.spark.sql.functions.col
    val path = tmp()
    GraftDelta.toDelta((1L to 7L).map(i => (i, s"v$i")).toDF("k", "v"), path,
      configuration = Map("delta.enableChangeDataFeed" -> "true"))        // v0
    GraftSql.sql(spark, s"TRUNCATE TABLE delta.`$path`")                  // v1
    val feed = DeltaTableOps.tableChanges(spark, path, 0L, Some(1L))
    val deletes = feed.filter(col("_change_type") === "delete")
    assert(deletes.count() == 7L, "all 7 rows must appear as cdc deletes")
    assert(deletes.select("k").as[Long].collect().sorted.toSeq == (1L to 7L))
  }

  test("TRUNCATE refuses on append-only tables") {
    val path = tmp()
    GraftDelta.toDelta(Seq((1L, "a")).toDF("k", "v"), path,
      configuration = Map("delta.appendOnly" -> "true"))
    val e = intercept[IllegalStateException](
      DeltaTableOps.truncateTable(spark, path))
    assert(e.getMessage.contains("append-only"), e.getMessage)
  }

  test("generated columns stay computed when omitted from an INSERT list") {
    val path = tmp()
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("k", LongType),
      StructField("k2", LongType, nullable = true,
        new MetadataBuilder()
          .putString("delta.generationExpression", "k * 2").build())))
    val seed = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(1L, 2L)), schema)
    GraftDelta.toDelta(seed, path)
    GraftSql.sql(spark, s"INSERT INTO delta.`$path` (k) VALUES (5)")
    val rows = GraftDelta.readDelta(spark, path).orderBy("k")
      .as[(Long, Long)].collect().toSeq
    assert(rows == Seq((1L, 2L), (5L, 10L)),
      "the write path must compute the omitted generated column")
  }
}
