package graft.delta

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MetadataBuilder

import java.nio.file.Files

/** Generated columns (delta.generationExpression): compute-when-absent,
  * validate-when-present, recompute-on-rewrite, SET refusal, protocol
  * stamping, and CDF postimage consistency. */
class GeneratedColumnsSpec extends GraftSuite {

  import TestBase.spark
  import spark.implicits._

  private def tmp(): String = {
    val d = Files.createTempDirectory("graft_gen")
    d.toFile.deleteOnExit()
    s"$d/tbl"
  }

  private val genMeta = new MetadataBuilder()
    .putString("delta.generationExpression", "k * 2").build()

  /** (k, v, doubled = k*2 with the generation expression attached). */
  private def frame(ks: Seq[Long]) =
    ks.map(k => (k, k * 10L)).toDF("k", "v")
      .withColumn("doubled", (col("k") * 2).as("doubled", genMeta))

  test("create stamps metadata + protocol 4; appends compute or validate") {
    val path = tmp()
    GraftDelta.toDelta(frame(1L to 5L), path)                            // v0
    val log = DeltaLog.forTable(spark, path)
    val snap = log.snapshot(None)
    assert(snap.protocol.minWriterVersion == 4)
    assert(snap.schema("doubled").metadata.getString("delta.generationExpression") == "k * 2")

    // absent generated column: computed by the writer
    GraftDelta.toDelta((6L to 8L).map(k => (k, k * 10L)).toDF("k", "v"),
      path, mode = "append")                                             // v1
    val got = GraftDelta.readDelta(spark, path)
      .select($"k", $"doubled").as[(Long, Long)].collect().toSeq.sorted
    assert(got == (1L to 8L).map(k => (k, k * 2)))

    // present-but-wrong values refuse loudly mid-flight
    intercept[Exception] {
      GraftDelta.toDelta(Seq((9L, 90L, 999L)).toDF("k", "v", "doubled"),
        path, mode = "append")
    }
    // present-and-right values pass
    GraftDelta.toDelta(Seq((9L, 90L, 18L)).toDF("k", "v", "doubled"),
      path, mode = "append")
    assert(GraftDelta.readDelta(spark, path).count() == 9)
  }

  test("UPDATE refuses SET on a generated column and recomputes on dependency change") {
    for (dv <- Seq(false, true)) {
      val path = tmp()
      GraftDelta.toDelta(frame(1L to 20L).repartition(2), path)
      val e = intercept[IllegalArgumentException] {
        GraftDelta.updateWhere(spark, path,
          Seq(Seq(Predicate("k", "==", 1L))), Map("doubled" -> lit(0L)))
      }
      assert(e.getMessage.contains("generated"))
      // SET k is refused only when k is a partition column — here it
      // isn't, so the dependency change must re-derive doubled
      val filters = Seq(Seq(Predicate("k", "<=", 3L)))
      val set = Map("k" -> (col("k") + 100L))
      if (dv) GraftDelta.updateWhereWithDv(spark, path, filters, set)
      else GraftDelta.updateWhere(spark, path, filters, set)
      val got = GraftDelta.readDelta(spark, path)
        .filter($"k" > 100L).select($"k", $"doubled")
        .as[(Long, Long)].collect().toSeq.sorted
      assert(got == (101L to 103L).map(k => (k, k * 2)), s"dv=$dv")
    }
  }

  test("MERGE recomputes generated columns over stale source values") {
    val path = tmp()
    GraftDelta.toDelta(frame(1L to 10L), path)
    // source claims doubled=0 — the rewrite must re-derive, not trust it
    GraftDelta.mergeInto(spark, path,
      Seq((1L, 111L, 0L), (11L, 110L, 0L)).toDF("k", "v", "doubled"),
      on = Seq("k"))
    val got = GraftDelta.readDelta(spark, path)
      .select($"k", $"doubled").as[(Long, Long)].collect().toSeq.sorted
    assert(got == (1L to 11L).map(k => (k, k * 2)))
  }

  test("predicates on the source column prune generated partitions at the log level") {
    import java.sql.Timestamp
    val path = tmp()
    val yearMeta = new MetadataBuilder()
      .putString("delta.generationExpression", "year(ts)").build()
    val rows = (2000 to 2003).flatMap(y =>
      (1 to 10).map(i => (Timestamp.valueOf(f"$y-06-${(i % 9) + 1}%02d 12:00:00"), y * 100L + i)))
    GraftDelta.toDelta(
      rows.toDF("ts", "v").withColumn("o_year", year($"ts").as("o_year", yearMeta)),
      path, partitionBy = Seq("o_year"))
    val snap = DeltaLog.forTable(spark, path).snapshot(None)
    assert(snap.activeFiles.size >= 4)
    // a predicate on ts ALONE derives o_year bounds (widened ±1 — the
    // timezone-proof margin) and drops far-away partitions before any scan
    val pruned = DeltaRead.prunedFiles(snap,
      Seq(Seq(Predicate("ts", ">", Timestamp.valueOf("2003-01-01 00:00:00")))))
    val years = pruned.flatMap(_.partitionValues.get("o_year")).map(_.toInt).toSet
    assert(!years.contains(2000) && !years.contains(2001), s"far years must prune: $years")
    assert(years.contains(2003), s"the matching year must survive: $years")
    // and the read through the same filters stays correct (pruning-only)
    val got = GraftDelta.readDelta(spark, path,
      filters = Seq(Seq(Predicate("ts", ">", Timestamp.valueOf("2003-01-01 00:00:00")))))
    assert(got.count() == 10)

    // the date-truncation flavor: p = CAST(ts AS DATE)
    val p2 = tmp()
    val dateMeta = new MetadataBuilder()
      .putString("delta.generationExpression", "CAST(ts AS DATE)").build()
    GraftDelta.toDelta(
      rows.toDF("ts", "v")
        .withColumn("d", $"ts".cast("date").as("d", dateMeta)),
      p2, partitionBy = Seq("d"))
    val snap2 = DeltaLog.forTable(spark, p2).snapshot(None)
    val pruned2 = DeltaRead.prunedFiles(snap2,
      Seq(Seq(Predicate("ts", ">=", Timestamp.valueOf("2003-06-05 00:00:00")))))
    val dates = pruned2.flatMap(_.partitionValues.get("d")).toSet
    assert(!dates.exists(_.startsWith("2000-")) && !dates.exists(_.startsWith("2001-")),
      s"old date partitions must prune: $dates")
  }

  test("month/date_trunc/date_format generation expressions prune partitions") {
    import java.sql.Timestamp
    val rows = (1 to 12).flatMap(m =>
      (1 to 5).map(i => (Timestamp.valueOf(f"2021-$m%02d-${i + 3}%02d 12:00:00"), m * 10L + i)))

    // month(ts) partitions: equality on ts derives month bounds
    val p1 = tmp()
    val monthMeta = new MetadataBuilder()
      .putString("delta.generationExpression", "month(ts)").build()
    GraftDelta.toDelta(
      rows.toDF("ts", "v").withColumn("m", month($"ts").as("m", monthMeta)),
      p1, partitionBy = Seq("m"))
    val snap1 = DeltaLog.forTable(spark, p1).snapshot(None)
    // isolate the KERNEL: strip per-file stats so only the partition
    // derivation can prune (the kernels exist for exactly this case —
    // foreign tables without stats); with stats present, timestamp
    // data-skipping prunes tighter and would mask the derivation
    val noStats = snap1.copy(activeFiles = snap1.activeFiles.map(_.copy(stats = None)))
    val pruned1 = DeltaRead.prunedFiles(noStats,
      Seq(Seq(Predicate("ts", "==", Timestamp.valueOf("2021-06-15 08:00:00")))))
    val months = pruned1.flatMap(_.partitionValues.get("m")).map(_.toInt).toSet
    assert(months.subsetOf(Set(5, 6, 7)), s"only near months may survive: $months")
    assert(months.contains(6), s"the matching month must survive: $months")
    // a RANGE on ts derives nothing through month (wraps) — all survive
    val noDerive = DeltaRead.prunedFiles(noStats,
      Seq(Seq(Predicate("ts", ">", Timestamp.valueOf("2021-06-15 08:00:00")))))
    assert(noDerive.size == snap1.activeFiles.size)
    // with stats PRESENT, timestamp skipping prunes the same equality to
    // nothing (no row carries that exact instant) — strictly tighter,
    // still sound
    assert(DeltaRead.prunedFiles(snap1,
      Seq(Seq(Predicate("ts", "==", Timestamp.valueOf("2021-06-15 08:00:00"))))).isEmpty)
    // …and a real row's instant keeps exactly its month's file
    val hit = DeltaRead.prunedFiles(snap1,
      Seq(Seq(Predicate("ts", "==", Timestamp.valueOf("2021-06-06 12:00:00")))))
    assert(hit.flatMap(_.partitionValues.get("m")).map(_.toInt).toSet == Set(6),
      s"stats skipping must keep only June: ${hit.size}")

    // day(ts) partitions: equality derives a contiguous day window; a
    // mid-month probe keeps only adjacent days
    val pDay = tmp()
    val dayMeta = new MetadataBuilder()
      .putString("delta.generationExpression", "day(ts)").build()
    GraftDelta.toDelta(
      rows.toDF("ts", "v").withColumn("dom", dayofmonth($"ts").as("dom", dayMeta)),
      pDay, partitionBy = Seq("dom"))
    val snapDay = DeltaLog.forTable(spark, pDay).snapshot(None)
    val prunedDay = DeltaRead.prunedFiles(snapDay,
      Seq(Seq(Predicate("ts", "==", Timestamp.valueOf("2021-06-06 12:00:00")))))
    val doms = prunedDay.flatMap(_.partitionValues.get("dom")).map(_.toInt).toSet
    assert(doms.subsetOf(Set(5, 6, 7)), s"only adjacent days may survive: $doms")
    assert(doms.contains(6), s"the matching day must survive: $doms")

    // date_trunc('month', ts) partitions: ranges derive truncated bounds
    val p2 = tmp()
    val truncMeta = new MetadataBuilder()
      .putString("delta.generationExpression", "date_trunc('month', ts)").build()
    GraftDelta.toDelta(
      rows.toDF("ts", "v")
        .withColumn("mon", date_trunc("month", $"ts").as("mon", truncMeta)),
      p2, partitionBy = Seq("mon"))
    val snap2 = DeltaLog.forTable(spark, p2).snapshot(None)
    assert(snap2.activeFiles.size >= 12)
    val pruned2 = DeltaRead.prunedFiles(snap2,
      Seq(Seq(Predicate("ts", ">=", Timestamp.valueOf("2021-10-02 00:00:00")))))
    val mons = pruned2.flatMap(_.partitionValues.get("mon")).toSet
    assert(!mons.exists(_.startsWith("2021-01")) && !mons.exists(_.startsWith("2021-06")),
      s"early months must prune: $mons")
    assert(mons.exists(_.startsWith("2021-10")), s"matching month must survive: $mons")
    // correctness unaffected (pruning-only)
    assert(GraftDelta.readDelta(spark, p2,
      filters = Seq(Seq(Predicate("ts", ">=",
        Timestamp.valueOf("2021-10-02 00:00:00"))))).count() ==
      rows.count(_._1.getTime >= Timestamp.valueOf("2021-10-02 00:00:00").getTime))

    // date_format(ts, 'yyyy-MM-dd') string partitions: lexicographic bounds
    val p3 = tmp()
    val fmtMeta = new MetadataBuilder()
      .putString("delta.generationExpression", "date_format(ts, 'yyyy-MM-dd')").build()
    GraftDelta.toDelta(
      rows.toDF("ts", "v")
        .withColumn("day", date_format($"ts", "yyyy-MM-dd").as("day", fmtMeta)),
      p3, partitionBy = Seq("day"))
    val snap3 = DeltaLog.forTable(spark, p3).snapshot(None)
    val pruned3 = DeltaRead.prunedFiles(snap3,
      Seq(Seq(Predicate("ts", "<", Timestamp.valueOf("2021-03-01 00:00:00")))))
    val days = pruned3.flatMap(_.partitionValues.get("day")).toSet
    assert(!days.exists(_ >= "2021-04"), s"later day-partitions must prune: $days")
    assert(days.exists(_.startsWith("2021-02")), s"matching days must survive: $days")
  }

  test("nested generated columns refuse; CDF postimages carry recomputed values") {
    val path = tmp()
    GraftDelta.toDelta(frame(1L to 10L).repartition(2), path)            // v0
    GraftDelta.enableChangeDataFeed(spark, path)                         // v1
    GraftDelta.updateWhere(spark, path,
      Seq(Seq(Predicate("k", "==", 2L))), Map("k" -> lit(50L)))          // v2
    val post = GraftDelta.tableChanges(spark, path, 1L)
      .filter($"_change_type" === "update_postimage")
      .select($"k", $"doubled").as[(Long, Long)].collect().toSeq
    assert(post == Seq((50L, 100L)))

    // nested generation expressions refuse at write time
    val p2 = tmp()
    val nestedMeta = new MetadataBuilder()
      .putString("delta.generationExpression", "1").build()
    val nested = Seq((1L, 2L)).toDF("k", "x")
      .withColumn("x", col("x").as("x", nestedMeta))
      .select($"k", struct($"x").as("s"))
    // the struct FIELD carries the metadata
    GraftDelta.toDelta(nested, p2)
    val s2 = DeltaLog.forTable(spark, p2).snapshot(None)
    if (s2.schema("s").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
        .apply("x").metadata.contains("delta.generationExpression"))
      intercept[IllegalStateException] {
        GraftDelta.toDelta(nested, p2, mode = "append")
      }
  }
}
