package graft.delta

import org.apache.spark.sql.functions._
import org.roaringbitmap.longlong.Roaring64NavigableMap

import java.nio.file.Files

/** Deletion vectors: codec round-trips, DV-flavored DELETE, scan
  * application, protocol upgrade, and the interplay with DML rewrites,
  * OPTIMIZE, checkpoints, counts, and time travel. */
class DeletionVectorSpec extends GraftSuite {

  private def tmp(): String = {
    val d = Files.createTempDirectory("graft_dv")
    d.toFile.deleteOnExit()
    s"$d/tbl"
  }

  private def rb(xs: Long*): Roaring64NavigableMap = {
    val r = new Roaring64NavigableMap()
    xs.foreach(r.addLong)
    r
  }

  test("z85 and bitmap serde round-trip; inline descriptor round-trips") {
    val rnd = new scala.util.Random(7)
    (1 to 20).foreach { _ =>
      val bytes = Array.fill((1 + rnd.nextInt(16)) * 4)(rnd.nextInt().toByte)
      assert(DeletionVectors.z85Decode(DeletionVectors.z85Encode(bytes)).toSeq == bytes.toSeq)
    }
    val bm = rb(0L, 5L, 1000L, (1L << 33) + 17L)
    val back = DeletionVectors.deserializeBitmap(DeletionVectors.serializeBitmap(bm))
    assert(back.contains(0L) && back.contains(5L) && back.contains(1000L) &&
      back.contains((1L << 33) + 17L) && !back.contains(1L))
    val d = DeletionVectors.inlineDescriptor(bm)
    assert(d.storageType == "i" && d.cardinality == 4L)
    val fs = new org.apache.hadoop.fs.Path("/tmp")
      .getFileSystem(spark.sessionState.newHadoopConf())
    val loaded = DeletionVectors.deserializeBitmap(
      DeletionVectors.loadBytes(fs, new org.apache.hadoop.fs.Path("/tmp"), d))
    assert(loaded.getLongCardinality == 4L && loaded.contains((1L << 33) + 17L))
  }

  test("DV delete soft-deletes without touching data files; reads apply the bitmap") {
    import spark.implicits._
    val path = tmp()
    GraftDelta.toDelta(
      (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "v").repartitionByRange(4, $"k"),
      path)
    val dataFilesBefore = DeltaLog.forTable(spark, path).snapshot(None)
      .activeFiles.map(_.path).toSet

    val r = GraftDelta.deleteWhereWithDv(spark, path,
      Seq(Seq(Predicate("k", ">", 40L), Predicate("k", "<=", 60L))))
    assert(r.affectedRows == 20L, s"$r")
    assert(r.rewrittenFiles == 0, s"DV delete must not rewrite: $r")
    assert(r.addedFiles > 0, s"$r")

    val snap = DeltaLog.forTable(spark, path).snapshot(None)
    // the same physical files remain active — only descriptors changed
    assert(snap.activeFiles.map(_.path).toSet == dataFilesBefore)
    assert(snap.activeFiles.exists(_.deletionVector.isDefined))
    // protocol upgraded with legacy features enumerated
    assert(snap.protocol.minReaderVersion == 3 && snap.protocol.minWriterVersion == 7)
    assert(snap.protocol.readerFeatures.get.contains("deletionVectors"))
    assert(snap.protocol.writerFeatures.get.contains("appendOnly"))

    val got = GraftDelta.readDelta(spark, path).select($"k").as[Long].collect().sorted
    assert(got.toSeq == ((1L to 40L) ++ (61L to 100L)), s"${got.length} rows")

    // second DV delete unions into the existing bitmaps
    val r2 = GraftDelta.deleteWhereWithDv(spark, path, Seq(Seq(Predicate("k", "==", 10L))))
    assert(r2.affectedRows == 1L, s"$r2")
    val got2 = GraftDelta.readDelta(spark, path).count()
    assert(got2 == 79L)
    // fully-consumed file: delete the rest of file k=26..50 range etc. is
    // layout-dependent — instead check a predicate covering a whole file
    // range turns into a remove, not a DV
    val r3 = GraftDelta.deleteWhereWithDv(spark, path, Seq(Seq(Predicate("k", "<=", 25L))))
    val snap3 = DeltaLog.forTable(spark, path).snapshot(None)
    assert(snap3.activeFiles.size < 4, s"a fully-dead file must be removed: $r3")
    assert(GraftDelta.readDelta(spark, path).count() == 79L - 24L) // k=10 was gone

    // time travel to v1 (after first delete) still applies v1's DV only
    assert(GraftDelta.readDelta(spark, path, version = Some(1L)).count() == 80L)
    // and to v0 sees everything
    assert(GraftDelta.readDelta(spark, path, version = Some(0L)).count() == 100L)
  }

  test("DV rows stay deleted through rewrite DML, OPTIMIZE, checkpoint, clone") {
    import spark.implicits._
    val path = tmp()
    GraftDelta.toDelta(
      (1 to 50).map(i => (i.toLong, s"v$i")).toDF("k", "v").repartitionByRange(2, $"k"),
      path)
    GraftDelta.deleteWhereWithDv(spark, path, Seq(Seq(Predicate("k", "<=", 5L))))

    // rewrite-flavor UPDATE on the DV'd table must not resurrect 1..5
    GraftDelta.updateWhere(spark, path,
      Seq(Seq(Predicate("k", "<=", 10L))), Map("v" -> lit("LOW")))
    val after = GraftDelta.readDelta(spark, path)
    assert(after.count() == 45L)
    assert(after.filter($"v" === "LOW").count() == 5L) // 6..10 only
    // the rewritten file dropped its DV (deleted rows physically gone)
    val snapU = DeltaLog.forTable(spark, path).snapshot(None)
    assert(after.filter($"k" <= 5L).count() == 0L)

    // DV again, then OPTIMIZE materializes it away
    GraftDelta.deleteWhereWithDv(spark, path, Seq(Seq(Predicate("k", "==", 20L))))
    val (_, _) = DeltaMaintenance.compact(spark, path)
    val snapC = DeltaLog.forTable(spark, path).snapshot(None)
    assert(snapC.activeFiles.forall(_.deletionVector.isEmpty),
      "OPTIMIZE must materialize DVs away")
    assert(GraftDelta.readDelta(spark, path).count() == 44L)

    // DV descriptors survive a checkpoint-bounded replay
    val path2 = tmp()
    GraftDelta.toDelta((1 to 30).map(i => (i.toLong, "x")).toDF("k", "v"), path2)
    GraftDelta.deleteWhereWithDv(spark, path2, Seq(Seq(Predicate("k", ">", 25L))))
    val log2 = DeltaLog.forTable(spark, path2)
    log2.writeCheckpoint(log2.latestVersion)
    // delete the JSON commits at or below the checkpoint: replay must
    // come from checkpoint rows alone
    (0L to log2.latestVersion).foreach { v =>
      log2.fs.delete(new org.apache.hadoop.fs.Path(log2.logPath, f"$v%020d.json"), false)
    }
    val snap2 = DeltaLog.forTable(spark, path2).snapshot(None)
    assert(snap2.activeFiles.exists(_.deletionVector.isDefined),
      "checkpoint must carry deletionVector structs")
    assert(GraftDelta.readDelta(spark, path2).count() == 25L)

    // shallow clone pins the DV absolute and reads correctly
    val cloneTgt = tmp()
    GraftDelta.shallowClone(spark, path2, cloneTgt)
    assert(GraftDelta.readDelta(spark, cloneTgt).count() == 25L)
  }

  test("DV delete equals rewrite delete result-wise; counts stay exact") {
    import spark.implicits._
    val pA = tmp(); val pB = tmp()
    val df = (1 to 80).map(i => (i.toLong, i % 4)).toDF("k", "b")
    GraftDelta.toDelta(df.repartitionByRange(4, $"k"), pA)
    GraftDelta.toDelta(df.repartitionByRange(4, $"k"), pB)
    val filt = Seq(Seq(Predicate("k", ">", 10L), Predicate("k", "<=", 30L)))
    val ra = GraftDelta.deleteWhereWithDv(spark, pA, filt)
    val rbx = GraftDelta.deleteWhere(spark, pB, filt)
    assert(ra.affectedRows == rbx.affectedRows)
    val a = GraftDelta.readDelta(spark, pA).select($"k").as[Long].collect().sorted.toSeq
    val b = GraftDelta.readDelta(spark, pB).select($"k").as[Long].collect().sorted.toSeq
    assert(a == b)

    // statsAggregate must NOT trust per-file min/max on a DV table
    val sa = DeltaTableOps.statsAggregate(spark, pA, Seq("k"))
    assert(!sa.metadataOnly, "DV invalidates live-row min/max — must scan")
    assert(sa.df.collect().head.getLong(0) == 60L)

    // countWhere counts DV'd proven files as numRecords − cardinality
    val cw = DeltaTableOps.countWhere(spark, pA, Seq(Seq(Predicate("k", ">", 0L))))
    assert(cw.count == 60L, s"$cw")

    // partitionCounts stays metadata-only with live-row counts
    val pP = tmp()
    GraftDelta.toDelta(df, pP, partitionBy = Seq("b"))
    GraftDelta.deleteWhereWithDv(spark, pP, Seq(Seq(Predicate("k", "<=", 8L))))
    val pc = DeltaTableOps.partitionCounts(spark, pP)
    assert(pc.metadataOnly, "DV cardinality keeps partition counts metadata-exact")
    assert(pc.df.agg(sum("n_rows")).collect().head.getLong(0) == 72L)
  }

  test("DV update appends only updated rows and equals the rewrite flavor") {
    import spark.implicits._
    val pA = tmp(); val pB = tmp()
    val df = (1 to 60).map(i => (i.toLong, i * 10L, s"v$i")).toDF("k", "x", "v")
    GraftDelta.toDelta(df.repartitionByRange(3, $"k"), pA)
    GraftDelta.toDelta(df.repartitionByRange(3, $"k"), pB)
    val filt = Seq(Seq(Predicate("k", ">", 50L)))
    // cross-column swap through the DV path: pre-update row semantics
    val set = Map("x" -> ($"x" + $"k"), "v" -> concat(lit("u"), $"v"))
    val ra = GraftDelta.updateWhereWithDv(spark, pA, filt, set)
    val rb2 = GraftDelta.updateWhere(spark, pB, filt, set)
    assert(ra.affectedRows == 10L && ra.affectedRows == rb2.affectedRows)
    assert(ra.rewrittenFiles == 0, s"$ra")
    val a = GraftDelta.readDelta(spark, pA).orderBy($"k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val b = GraftDelta.readDelta(spark, pB).orderBy($"k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(a == b)
    assert(a.count(_._3.startsWith("u")) == 10)
    // the untouched files were not rewritten: original adds still active
    val snapA = DeltaLog.forTable(spark, pA).snapshot(None)
    assert(snapA.activeFiles.count(_.deletionVector.isDefined) == 1,
      "only the boundary file carries a DV")
    // a fully-matched file promotes to remove + fresh rows (no DV)
    val rFull = GraftDelta.updateWhereWithDv(spark, pA, Seq(Seq(Predicate("k", "<=", 20L))),
      Map("v" -> lit("W")))
    assert(rFull.affectedRows == 20L, s"$rFull")
    assert(GraftDelta.readDelta(spark, pA).filter($"v" === "W").count() == 20L)
  }

  test("vacuum reclaims DV files on the tombstone retention clock, never live ones") {
    import spark.implicits._
    val path = tmp()
    GraftDelta.toDelta(
      (1 to 40).map(i => (i.toLong, "x")).toDF("k", "v").repartitionByRange(2, $"k"),
      path)
    // v1: DV on both files; v2: supersede file 1's DV (union) — v1's DV
    // file becomes unreferenced by ACTIVE adds but the v2 remove holds it
    GraftDelta.deleteWhereWithDv(spark, path, Seq(Seq(Predicate("k", "==", 5L))))
    GraftDelta.deleteWhereWithDv(spark, path, Seq(Seq(Predicate("k", "==", 7L))))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def dvFilesOnDisk: Set[String] = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .map(_.getPath.getName).filter(_.startsWith("deletion_vector_")).toSet
    assert(dvFilesOnDisk.size == 2)

    // within retention nothing is reclaimable
    assert(DeltaTableOps.vacuum(spark, path, retentionHours = 168.0, dryRun = true).isEmpty)
    // at retention 0 the superseded v1 DV file (and no other) expires
    val dry = DeltaTableOps.vacuum(spark, path, retentionHours = 0.0, dryRun = true)
    assert(dry.count(_.startsWith("deletion_vector_")) == 1, s"$dry")
    DeltaTableOps.vacuum(spark, path, retentionHours = 0.0, dryRun = false)
    assert(dvFilesOnDisk.size == 1, "the live DV file must survive vacuum")
    // reads still correct after reclaim
    assert(GraftDelta.readDelta(spark, path).count() == 38L)
  }

  test("tableChanges emits DV commits as per-row deletes (bitmap diff)") {
    import spark.implicits._
    val path = tmp()
    GraftDelta.toDelta(
      (1 to 20).map(i => (i.toLong, s"x$i")).toDF("k", "v").coalesce(1), path) // v0
    GraftDelta.toDelta((21 to 25).map(i => (i.toLong, s"y$i")).toDF("k", "v"), path,
      mode = "append")                                                    // v1
    GraftDelta.deleteWhereWithDv(spark, path,
      Seq(Seq(Predicate("k", ">=", 3L), Predicate("k", "<=", 5L))))       // v2
    GraftDelta.deleteWhereWithDv(spark, path, Seq(Seq(Predicate("k", "==", 9L)))) // v3
    GraftDelta.updateWhereWithDv(spark, path, Seq(Seq(Predicate("k", "==", 12L))),
      Map("v" -> lit("updated")))                                         // v4

    val cf = DeltaTableOps.tableChanges(spark, path, 0L)
      .select($"k", $"v", $"_change_type", $"_commit_version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    val expected: Set[(Long, String, String, Long)] =
      (21L to 25L).map(i => (i, s"y$i", "insert", 1L)).toSet ++
        (3L to 5L).map(i => (i, s"x$i", "delete", 2L)).toSet +
        ((9L, "x9", "delete", 3L)) +
        ((12L, "x12", "delete", 4L)) +          // preimage
        ((12L, "updated", "insert", 4L))        // postimage
    assert(cf == expected, s"got $cf")
    // a DV-superseding commit only emits its OWN diff (v3 ∌ 3..5);
    // pinned above by v3 containing exactly k=9
    // a range that excludes DV commits is plain inserts
    assert(DeltaTableOps.tableChanges(spark, path, 0L, Some(1L)).count() == 5L)
  }

  test("readStream changeFeed mode streams DV deletes and inserts") {
    import spark.implicits._
    val path = tmp()
    GraftDelta.toDelta(
      (1 to 30).map(i => (i.toLong, s"x$i")).toDF("k", "v").coalesce(1), path) // v0
    GraftDelta.deleteWhereWithDv(spark, path,
      Seq(Seq(Predicate("k", "<=", 4L))))                                 // v1
    GraftDelta.updateWhereWithDv(spark, path, Seq(Seq(Predicate("k", "==", 20L))),
      Map("v" -> lit("u20")))                                             // v2

    val q = spark.readStream.format("graft")
      .option("changeFeed", "true")
      .load(path)
      .writeStream.format("memory").queryName("dv_cf").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("dv_cf")
        .select($"k", $"v", $"_change_type", $"_commit_version")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSet
      val expected: Set[(Long, String, String, Long)] =
        (1L to 30L).map(i => (i, s"x$i", "insert", 0L)).toSet ++
          (1L to 4L).map(i => (i, s"x$i", "delete", 1L)).toSet +
          ((20L, "x20", "delete", 2L)) + ((20L, "u20", "insert", 2L))
      assert(got == expected, s"got $got")
    } finally q.stop()
  }

  test("DV scan probe is codegen'd and broadcast — no ScalaUDF in the plan") {
    import spark.implicits._
    val path = tmp()
    GraftDelta.toDelta(
      (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "v").repartitionByRange(4, $"k"),
      path)
    GraftDelta.deleteWhereWithDv(spark, path, Seq(Seq(Predicate("k", ">", 90L))))
    val df = GraftDelta.readDelta(spark, path)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), s"DV probe must not be a ScalaUDF:\n$plan")
    assert(plan.contains("dv_live"), s"expected the DvProbe expression in the plan:\n$plan")
    assert(df.count() == 90L)
    // polarity twin: selectDeleted returns exactly the bitmap rows
    val snap = DeltaLog.forTable(spark, path).snapshot(None)
    val root = new org.apache.hadoop.fs.Path(path)
    val bytes = DeletionVectors.dvByteMap(spark, root, snap.activeFiles)
    val deleted = DeletionVectors.selectDeleted(
      spark.read.schema(snap.schema).option("basePath", path).parquet(
        snap.activeFiles.map(f => DeltaRead.resolvePath(path, f.path)): _*),
      bytes)
    assert(deleted.select($"k").as[Long].collect().sorted.toSeq == (91L to 100L))
  }

  test("DV DML positions aggregate executor-side: bitmap aggregator, no collect_list") {
    // semantics: reduce/merge/finish over an arbitrary split equals the
    // bitmap of all positions (the aggregator is the distributed replacement
    // for driver-side bitmap building)
    val agg = DeletionVectors.PositionBitmapAgg
    val positions = Seq(0L, 1L, 7L, 1000L, (1L << 34) + 3L, 42L)
    val (l, r) = positions.splitAt(2)
    val b1 = l.foldLeft(agg.zero)(agg.reduce)
    val b2 = r.foldLeft(agg.zero)(agg.reduce)
    val merged = DeletionVectors.deserializeBitmap(agg.finish(agg.merge(b1, b2)))
    assert(positions.forall(merged.contains) &&
      merged.getLongCardinality == positions.size)

    // plan pin: the phase-1 aggregate is a TWO-PHASE ObjectHashAggregate
    // over the typed aggregator — partial bitmaps combine map-side and no
    // collect_list of positions appears anywhere in the plan
    import spark.implicits._
    val path = tmp()
    GraftDelta.toDelta(
      (1 to 50).map(i => (i.toLong, s"v$i")).toDF("k", "v").repartition(4), path)
    val snap = DeltaLog.forTable(spark, path).snapshot(None)
    val frame = DeltaDml.matchedBitmapFrame(
      DeltaDml.readFiles(spark, path, snap, snap.activeFiles, keepMeta = true)
        .filter(col("k") > 10L))
    val plan = frame.queryExecution.executedPlan.toString
    assert(!plan.contains("collect_list"), plan)
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan)
    val rows = frame.collect()
    assert(rows.map(_.getLong(2)).sum == 40L)
    rows.foreach { r0 =>
      val bm = DeletionVectors.deserializeBitmap(r0.getAs[Array[Byte]](1))
      assert(bm.getLongCardinality == r0.getLong(2))
    }
  }

  test("unknown reader-3 features refuse; known features pass the gate") {
    import spark.implicits._
    val path = tmp()
    GraftDelta.toDelta((1 to 5).map(i => (i.toLong, "x")).toDF("k", "v"), path)
    val log = DeltaLog.forTable(spark, path)
    log.writeCommit(1L, Seq(
      Protocol(3, 7,
        readerFeatures = Some(Seq("deletionVectors", "someFutureFeature")),
        writerFeatures = Some(Seq("deletionVectors")))))
    val e = intercept[IllegalStateException](GraftDelta.readDelta(spark, path).count())
    assert(e.getMessage.contains("someFutureFeature"), e.getMessage)
    // a supported feature set at reader 3 reads fine
    log.writeCommit(2L, Seq(
      Protocol(3, 7,
        readerFeatures = Some(Seq("deletionVectors")),
        writerFeatures = Some(Seq("deletionVectors", "appendOnly")))))
    assert(GraftDelta.readDelta(spark, path).count() == 5L)
    // unknown writer feature refuses DML/writes but not reads
    log.writeCommit(3L, Seq(
      Protocol(3, 7,
        readerFeatures = Some(Seq("deletionVectors")),
        writerFeatures = Some(Seq("deletionVectors", "icebergCompatV2")))))
    assert(GraftDelta.readDelta(spark, path).count() == 5L)
    val e2 = intercept[IllegalStateException](
      GraftDelta.deleteWhere(spark, path, Seq(Seq(Predicate("k", "==", 1L)))))
    assert(e2.getMessage.contains("icebergCompatV2"), e2.getMessage)
  }
}
