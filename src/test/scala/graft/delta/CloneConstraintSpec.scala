package graft.delta

import org.apache.spark.sql.functions._

import java.nio.file.Files

/** SHALLOW CLONE + CHECK constraint pins.
  *
  * Clone: metadata-only (zero parquet under the clone root), reads the
  * source's bytes, evolves independently, and can never corrupt the
  * source — vacuum skips outside-root (absolute-path) tombstones.
  * Constraints: table-scan validation on ADD, in-flight enforcement on
  * append AND DML rewrites, protocol raised to writer v3, v3 tables
  * remain writable by us (we enforce), v4+ still refused. */
class CloneConstraintSpec extends GraftSuite {

  private def tmp(): String = {
    val d = Files.createTempDirectory("graft_cc")
    d.toFile.deleteOnExit()
    s"$d/tbl"
  }

  private def sample = {
    import spark.implicits._
    (0 until 100).map(i => (i.toLong, i * 1.5, s"name_$i")).toDF("ints", "floats", "strings")
  }

  test("shallow clone is metadata-only and reads the source snapshot") {
    val src = tmp(); val cln = tmp()
    GraftDelta.toDelta(sample, src)
    val res = GraftDelta.shallowClone(spark, src, cln)
    assert(res.tableVersion == 0L && res.clonedFiles > 0)
    // no data file was copied: the clone dir holds only _delta_log
    val copied = new java.io.File(cln).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(copied.isEmpty, s"clone must not copy data files: ${copied.toSeq}")
    assert(GraftDelta.readDelta(spark, cln).orderBy("ints").collect().toSeq ==
      GraftDelta.readDelta(spark, src).orderBy("ints").collect().toSeq)
  }

  test("clone at a pinned version sees that snapshot, not the head") {
    import spark.implicits._
    val src = tmp(); val cln = tmp()
    GraftDelta.toDelta(sample, src)                                  // v0
    GraftDelta.toDelta(sample.withColumn("ints", $"ints" + 1000L),
      src, mode = "append")                                          // v1
    GraftDelta.shallowClone(spark, src, cln, version = Some(0L))
    assert(GraftDelta.readDelta(spark, cln).count() == 100)
  }

  test("writes to a clone never touch the source; vacuum skips foreign files") {
    import spark.implicits._
    val src = tmp(); val cln = tmp()
    GraftDelta.toDelta(sample, src)
    GraftDelta.shallowClone(spark, src, cln)
    // overwrite the clone: every source file becomes a clone tombstone
    GraftDelta.toDelta(sample.filter($"ints" < 10), cln, mode = "overwrite")
    // vacuum with zero retention: tombstones are expired but FOREIGN —
    // they must be skipped, not deleted (and not even listed)
    val listed = GraftDelta.vacuum(spark, cln, retentionHours = 0.0, dryRun = false)
    assert(listed.isEmpty, s"foreign tombstones must not be vacuum targets: $listed")
    assert(GraftDelta.readDelta(spark, src).count() == 100,
      "source corrupted by vacuuming a clone")
    // sanity: the clone's own head survives too
    assert(GraftDelta.readDelta(spark, cln).count() == 10)
  }

  test("deep clone copies bytes: source deletion cannot touch the clone") {
    import spark.implicits._
    val src = tmp()
    val clone = tmp()
    GraftDelta.toDelta(
      (1L to 30L).map(i => (i, s"v$i", i % 3)).toDF("k", "v", "g"), src,
      partitionBy = Seq("g"))
    val r = GraftDelta.deepClone(spark, src, clone)
    assert(r.clonedFiles >= 3)
    // every add under the clone is clone-root relative (no source refs)
    val snap = DeltaLog.forTable(spark, clone).snapshot(None)
    assert(snap.activeFiles.forall(f => !f.path.startsWith("/") && !f.path.contains(src)),
      snap.activeFiles.map(_.path).mkString(","))
    assert(GraftDelta.readDelta(spark, clone).as[(Long, String, Long)]
      .collect().toSet == (1L to 30L).map(i => (i, s"v$i", i % 3)).toSet)
    // obliterate the source entirely: the clone still reads (deep = no sharing)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(new java.io.File(src))
    assert(GraftDelta.readDelta(spark, clone).count() == 30L)
  }

  test("deep clone re-materializes deletion vectors under the clone root") {
    import spark.implicits._
    val src = tmp()
    val clone = tmp()
    GraftDelta.toDelta((1L to 40L).map(identity).toDF("k").repartition(2), src)
    GraftDelta.deleteWhereWithDv(spark, src, Seq(Seq(Predicate("k", "<=", 5L))))
    assert(DeltaLog.forTable(spark, src).snapshot(None)
      .activeFiles.exists(_.deletionVector.isDefined), "precondition: DV commit")
    GraftDelta.deepClone(spark, src, clone)
    assert(GraftDelta.readDelta(spark, clone).as[Long].collect().toSet ==
      (6L to 40L).toSet, "soft-deleted rows must not resurrect in the clone")
    // the clone's descriptors resolve under ITS OWN root
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(new java.io.File(src))
    assert(GraftDelta.readDelta(spark, clone).count() == 35L)
  }

  test("deep clone of a shallow clone materializes the absolute adds") {
    import spark.implicits._
    val src = tmp()
    val shallow = tmp()
    val deep = tmp()
    GraftDelta.toDelta((1L to 10L).map(identity).toDF("k"), src)
    GraftDelta.shallowClone(spark, src, shallow)
    graft.sql.GraftSql.sql(spark,
      s"CREATE TABLE delta.`$deep` DEEP CLONE delta.`$shallow`")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(new java.io.File(src))
    assert(GraftDelta.readDelta(spark, deep).as[Long].collect().toSet ==
      (1L to 10L).toSet)
  }

  test("partitioned scan keys partition values by full path when basenames collide") {
    import spark.implicits._
    // three source roots carrying the SAME data-file basename — the
    // multi-source shallow-clone shape; the scan must fall back to
    // full-path keying instead of refusing. Two roots carry
    // URL-encodable characters (a space; a literal '%41') to pin the
    // decode normalization: scan-side `_metadata.file_path` arrives
    // percent-ENCODED ("with%20space", "pct%2541lit") while the
    // file-side keys are raw resolved paths — '%41' must stay literal,
    // not decode to 'A'.
    def stageDup(out: java.nio.file.Path, lo: Long, hi: Long): java.io.File = {
      (lo to hi).map(Tuple1(_)).toDF("k").coalesce(1).write.parquet(out.toString)
      val part = out.toFile.listFiles().filter(_.getName.endsWith(".parquet")).head
      val fixed = new java.io.File(out.toFile, "part-00000-dup.snappy.parquet")
      assert(part.renameTo(fixed)); fixed
    }
    val dirA = Files.createTempDirectory("graft_dupA")
    val dirB = Files.createTempDirectory("graft_dupB")
    val dirC = Files.createTempDirectory("graft_dupC")
    val fA = stageDup(dirA.resolve("out"), 1L, 3L)
    val fB = stageDup(dirB.resolve("with space"), 10L, 13L)
    val fC = stageDup(dirC.resolve("pct%41lit"), 20L, 21L)
    val path = tmp()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("bucket", org.apache.spark.sql.types.IntegerType)))
    DeltaLog.forTable(spark, path).writeCommit(0L, Seq(
      CommitInfo(System.currentTimeMillis(), "CLONE"),
      Protocol(1, 2),
      MetadataAction(id = "dup-basenames", schemaString = schema.json,
        partitionColumns = Seq("bucket")),
      AddFile(path = s"file:$fA", partitionValues = Map("bucket" -> "1"),
        size = fA.length(), modificationTime = fA.lastModified(), dataChange = true),
      AddFile(path = s"file:$fB", partitionValues = Map("bucket" -> "2"),
        size = fB.length(), modificationTime = fB.lastModified(), dataChange = true),
      AddFile(path = s"file:$fC", partitionValues = Map("bucket" -> "3"),
        size = fC.length(), modificationTime = fC.lastModified(), dataChange = true)))
    val df = GraftDelta.readDelta(spark, path)
    val got = df.select($"k", $"bucket").as[(Long, Int)].collect().toSet
    val want = (1L to 3L).map((_, 1)).toSet ++ (10L to 13L).map((_, 2)).toSet ++
      (20L to 21L).map((_, 3)).toSet
    assert(got == want, s"got $got")
    // partition pruning on the attached values still works — including
    // for the encoded-character roots
    assert(GraftDelta.readDelta(spark, path,
      filters = Seq(Seq(Predicate("bucket", "==", 2)))).count() == 4L)
    assert(GraftDelta.readDelta(spark, path,
      filters = Seq(Seq(Predicate("bucket", "==", 3)))).count() == 2L)
  }

  test("clone refuses an existing delta table target") {
    val src = tmp(); val cln = tmp()
    GraftDelta.toDelta(sample, src)
    GraftDelta.toDelta(sample, cln)
    intercept[IllegalArgumentException] {
      GraftDelta.shallowClone(spark, src, cln)
    }
  }

  test("CREATE OR REPLACE CLONE swaps the snapshot, preserves history and table id") {
    import spark.implicits._
    val src = tmp(); val cln = tmp()
    GraftDelta.toDelta(Seq((1L, "new"), (2L, "new")).toDF("id", "v"), src)
    GraftDelta.toDelta(Seq((10L, "old"), (11L, "old"), (12L, "old")).toDF("id", "v"), cln)
    val oldId = DeltaLog.forTable(spark, cln).snapshot(None).metadata.id
    val r = graft.sql.GraftSql.sql(spark,
      s"CREATE OR REPLACE TABLE delta.`$cln` SHALLOW CLONE delta.`$src`")
    assert(r.collect()(0).getLong(1) == 1L, "replace commits at v1, preserving history")
    val snap = DeltaLog.forTable(spark, cln).snapshot(None)
    assert(snap.metadata.id == oldId, "the replaced table keeps its identity")
    assert(GraftDelta.readDelta(spark, cln).select($"id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L))
    // time travel still reads the pre-replace snapshot
    assert(GraftDelta.readDelta(spark, cln, version = Some(0L)).count() == 3L)
  }

  test("deep OR REPLACE copies under commit-versioned names; old files stay readable") {
    import spark.implicits._
    val src = tmp(); val cln = tmp()
    GraftDelta.toDelta(Seq((1L, "s")).toDF("id", "v"), src)
    // the target IS a deep clone of src already — replacing with the same
    // source must not overwrite the still-referenced v0 copies
    GraftDelta.deepClone(spark, src, cln)
    GraftDelta.toDelta(Seq((2L, "s2")).toDF("id", "v"), src, mode = "append")
    val v0Files = DeltaLog.forTable(spark, cln).snapshot(None).activeFiles.map(_.path)
    val r = GraftDelta.deepClone(spark, src, cln, replace = true)
    assert(r.tableVersion == 1L)
    val snap = DeltaLog.forTable(spark, cln).snapshot(None)
    assert(snap.activeFiles.forall(_.path.startsWith("deep-v1-")),
      snap.activeFiles.map(_.path).toString)
    assert(snap.activeFiles.map(_.path).toSet.intersect(v0Files.toSet).isEmpty)
    assert(GraftDelta.readDelta(spark, cln).count() == 2L)
    // the pre-replace version still reads from its own untouched copies
    assert(GraftDelta.readDelta(spark, cln, version = Some(0L))
      .select($"id").as[Long].collect().toSeq == Seq(1L))
  }

  test("ADD CONSTRAINT validates existing rows and rejects violating appends") {
    import spark.implicits._
    val path = tmp()
    GraftDelta.toDelta(sample, path)
    // violated by existing rows → refused, no commit
    intercept[IllegalArgumentException] {
      GraftDelta.addCheckConstraint(spark, path, "ints_small", "ints < 50")
    }
    assert(DeltaLog.forTable(spark, path).latestVersion == 0L)
    // holds → committed, protocol raised to writer v3
    GraftDelta.addCheckConstraint(spark, path, "ints_bound", "ints < 1000")
    val snap = DeltaLog.forTable(spark, path).snapshot(None)
    assert(snap.protocol.minWriterVersion == 3)
    assert(snap.metadata.configuration("delta.constraints.ints_bound") == "ints < 1000")
    // conforming append passes
    GraftDelta.toDelta(sample.withColumn("ints", $"ints" + 500L), path, mode = "append")
    // violating append fails BEFORE any commit — no partial state
    val vBefore = DeltaLog.forTable(spark, path).latestVersion
    intercept[Exception] {
      GraftDelta.toDelta(sample.withColumn("ints", lit(99999L)), path, mode = "append")
    }
    assert(DeltaLog.forTable(spark, path).latestVersion == vBefore,
      "violating write must not commit")
    assert(GraftDelta.readDelta(spark, path).count() == 200)
  }

  test("DML rewrites re-validate constraints (UPDATE cannot break them)") {
    val path = tmp()
    GraftDelta.toDelta(sample, path)
    GraftDelta.addCheckConstraint(spark, path, "ints_bound", "ints < 1000")
    val vBefore = DeltaLog.forTable(spark, path).latestVersion
    intercept[Exception] {
      GraftDelta.updateWhere(spark, path,
        Seq(Seq(Predicate("ints", "<", 5L))),
        Map("ints" -> expr("ints + 100000")))
    }
    assert(DeltaLog.forTable(spark, path).latestVersion == vBefore)
    // NULL constraint values pass (SQL CHECK semantics): a predicate on
    // a nullable expression admits rows where it evaluates to NULL
    GraftDelta.dropConstraint(spark, path, "ints_bound")
    GraftDelta.addCheckConstraint(spark, path, "null_passes",
      "CASE WHEN ints < 0 THEN NULL ELSE true END")
    GraftDelta.toDelta(sample, path, mode = "append") // all pass (none negative)
    assert(GraftDelta.readDelta(spark, path).count() == 200)
  }

  test("writer ≤5 writable; version-implied obligations and v6 refuse") {
    val path = tmp()
    GraftDelta.toDelta(sample, path)
    val log = DeltaLog.forTable(spark, path)
    log.writeCommit(1L, Seq(Protocol(1, 3)))
    GraftDelta.toDelta(sample, path, mode = "append") // v3: fine, we enforce
    // v4/v5 are version-accepted — their obligations (CDF, generated
    // columns, column mapping) only bind when the trigger appears
    log.writeCommit(3L, Seq(Protocol(1, 5)))
    GraftDelta.toDelta(sample, path, mode = "append")
    // the CDF table property is such a trigger — and the obligation is
    // HONORED (r5): a blind append legally carries no cdc (its adds read
    // as inserts), while a row-removing write stages _change_data files
    // (ChangeDataFeedSpec pins those); both write cleanly
    val snap = log.snapshot(None)
    log.writeCommit(snap.version + 1, Seq(snap.metadata.copy(
      configuration = snap.metadata.configuration +
        ("delta.enableChangeDataFeed" -> "true"))))
    GraftDelta.toDelta(sample, path, mode = "append")
    GraftDelta.deleteWhere(spark, path, Seq(Seq(Predicate("ints", "==", 1L))))
    assert(DeltaLog.forTable(spark, path).readCommitActions(log.latestVersion)
      .exists(_.isInstanceOf[AddCDCFile]))
    // identity columns (v6) are honored now (r5, IdentityColumnsSpec);
    // a v6 table with no identity metadata appends cleanly
    val path2 = tmp()
    GraftDelta.toDelta(sample, path2)
    DeltaLog.forTable(spark, path2).writeCommit(1L, Seq(Protocol(1, 6)))
    GraftDelta.toDelta(sample, path2, mode = "append")
    // version 7 WITHOUT a writerFeatures list proves nothing — refuse
    val path3 = tmp()
    GraftDelta.toDelta(sample, path3)
    DeltaLog.forTable(spark, path3).writeCommit(1L, Seq(Protocol(1, 7)))
    intercept[IllegalStateException] {
      GraftDelta.toDelta(sample, path3, mode = "append")
    }
  }
}
