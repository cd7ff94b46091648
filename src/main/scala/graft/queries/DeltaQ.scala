package graft.queries

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.delta.{AddFile, CommitInfo, DeltaLog, DeltaMaintenance, DeltaTableOps, GraftDelta, Predicate, Protocol}

/** Harness queries for the Delta engine operators (SURVEY.md §2 ①-⑭).
  *
  * Each query stages a temp Delta table from the driver's parquet
  * testdata via our writer, then exercises one operator via our reader;
  * the DuckDB oracle expresses the same result against the source
  * parquet directly, so correctness of BOTH write and read paths is
  * machine-checked (write bugs corrupt the readback and fail the hash).
  */
object DeltaQ {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private def cents(c: Column): Column = round(c * 100).cast("long")

  private def tmp(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_$prefix")
    d.toFile.deleteOnExit()
    s"$d/tbl"
  }

  /** d04's staged table per sf dir — see the query's comment. */
  private val d04Staged = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** d30's staged table per sf dir — see the query's comment. */
  private val d30Staged = new java.util.concurrent.ConcurrentHashMap[String, String]()

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ① scan + ⑬ transactional write: full roundtrip through the log.
    "d01_roundtrip" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d01")
      GraftDelta.toDelta(t(s, dir, "supplier"), path)
      GraftDelta.readDelta(s, path)
        .select($"s_suppkey", $"s_name", $"s_nationkey", cents($"s_acctbal").as("acctbal_c"))
        .orderBy($"s_suppkey")
    }),

    // ② time travel by version: v1 append must be invisible at v0.
    "d02_travel_version" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d02")
      val o = t(s, dir, "orders")
      GraftDelta.toDelta(o.filter($"o_orderkey" < 5000), path)
      GraftDelta.toDelta(o.filter($"o_orderkey" >= 5000), path, mode = "append")
      GraftDelta.readDelta(s, path, version = Some(0L))
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus", cents($"o_totalprice").as("total_c"))
        .orderBy($"o_orderkey")
    }),

    // ③ time travel by timestamp: pin to v0's commitInfo timestamp.
    "d03_travel_timestamp" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d03")
      val o = t(s, dir, "orders")
      GraftDelta.toDelta(o.filter($"o_orderkey" < 5000), path)
      Thread.sleep(20) // ensure v1's commit timestamp is strictly later
      GraftDelta.toDelta(o.filter($"o_orderkey" >= 5000), path, mode = "append")
      val ts0 = DeltaLog.forTable(s, path).commitTimestamps.head._2
      GraftDelta.readDelta(s, path,
          timestamp = Some(java.time.Instant.ofEpochMilli(ts0).toString))
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus", cents($"o_totalprice").as("total_c"))
        .orderBy($"o_orderkey")
    }),

    // ④ checkpoint-accelerated replay: 12 appends, checkpoints at v5 and
    // v10; commits ≤ v10 are then DELETED, so the read can only succeed
    // by starting from the checkpoint. The 12-commit staging is memoized
    // per (sf dir, JVM): it is setup, not the operator under test — with
    // min-of-two bench passes the reported time is the checkpoint-replay
    // READ, not the staging writes (r4 VERDICT bench-hygiene item).
    "d04_checkpoint" -> ((s, dir) => {
      import s.implicits._
      val path = d04Staged.computeIfAbsent(dir, { d =>
        val p = tmp("d04")
        val sup = t(s, d, "supplier")
        (0 until 12).foreach { i =>
          GraftDelta.toDelta(sup.filter($"s_suppkey" % 12 === i), p,
            mode = if (i == 0) "error" else "append", checkpointInterval = 5)
        }
        val log = DeltaLog.forTable(s, p)
        (0L to 10L).foreach(v => log.fs.delete(log.commitFile(v), false))
        p
      })
      // the query's CONTRACT is a replay that can only succeed through
      // the checkpoint — a snapshot-cache hit would bypass the scenario
      DeltaLog.clearCache()
      GraftDelta.readDelta(s, path)
        .select($"s_suppkey", $"s_name", cents($"s_acctbal").as("acctbal_c"))
        .orderBy($"s_suppkey")
    }),

    // ⑤ projection pushdown through the reader's columns= parameter.
    "d05_projection" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d05")
      GraftDelta.toDelta(t(s, dir, "part"), path)
      GraftDelta.readDelta(s, path, columns = Seq("p_partkey", "p_brand"))
        .orderBy($"p_partkey")
    }),

    // ⑥ predicate pushdown (DNF row filter) through filters=.
    "d06_predicate" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d06")
      GraftDelta.toDelta(t(s, dir, "customer"), path)
      GraftDelta.readDelta(s, path,
          filters = Seq(Seq(Predicate("c_acctbal", ">", 5000), Predicate("c_nationkey", "<=", 10))))
        .select($"c_custkey", $"c_name", $"c_nationkey", cents($"c_acctbal").as("acctbal_c"))
        .orderBy($"c_custkey")
    }),

    // ⑦ partition pruning: hive-partitioned table, OR-of-ANDs filter
    // prunes at the log level before any scan exists.
    "d07_partition_prune" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d07")
      GraftDelta.toDelta(t(s, dir, "orders"), path, partitionBy = Seq("o_orderstatus"))
      GraftDelta.readDelta(s, path,
          filters = Seq(
            Seq(Predicate("o_orderstatus", "==", "O")),
            Seq(Predicate("o_orderstatus", "==", "F"))))
        .select($"o_orderkey", $"o_orderstatus", cents($"o_totalprice").as("total_c"))
        .orderBy($"o_orderkey")
    }),

    // ⑧ schema evolution: after an overwrite adds a column, v0 must still
    // read with its original 2-column schema.
    "d08_schema_evolution" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d08")
      val r = t(s, dir, "region")
      GraftDelta.toDelta(r, path)
      GraftDelta.toDelta(r.withColumn("r_name_upper", upper($"r_name")), path,
        mode = "overwrite", overwriteSchema = true)
      GraftDelta.readDelta(s, path, version = Some(0L)).orderBy($"r_regionkey")
    }),

    // ⑨ empty-table scan: correct schema, zero rows.
    "d09_empty" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d09")
      GraftDelta.toDelta(t(s, dir, "nation").filter(lit(false)), path)
      GraftDelta.readDelta(s, path).orderBy($"n_nationkey")
    }),

    // ⑩ history: 9-column projection, desc order; deterministic columns.
    "d10_history" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d10")
      val r = t(s, dir, "region").repartition(1)
      GraftDelta.toDelta(r, path)
      GraftDelta.toDelta(r, path, mode = "append")
      GraftDelta.toDelta(r, path, mode = "append")
      GraftDelta.readDeltaHistory(s, path)
        .select($"version", $"operation",
          $"operationParameters_mode".as("mode"),
          $"operationMetrics_numFiles".as("num_files"))
        .orderBy($"version".desc)
    }),

    // ⑪+⑫ vacuum dry-run then delete: tombstone count and files left.
    "d11_vacuum" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d11")
      val r = t(s, dir, "region")
      GraftDelta.toDelta(r.repartition(2), path)
      GraftDelta.toDelta(r.repartition(3), path, mode = "overwrite")
      val dry = GraftDelta.vacuum(s, path, retentionHours = -0.01, dryRun = true)
      GraftDelta.vacuum(s, path, retentionHours = -0.01, dryRun = false)
      val left = {
        val fs = new Path(path).getFileSystem(s.sessionState.newHadoopConf())
        fs.listStatus(new Path(path)).count(st =>
          st.isFile && st.getPath.getName.endsWith(".parquet"))
      }
      Seq((dry.size.toLong, left.toLong)).toDF("tombstones", "files_after")
    }),

    // OPTIMIZE: fragment supplier into 8 files, compact, verify file
    // counts AND that the data is untouched (read the post-compaction
    // snapshot against the source table).
    "d13_compaction" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d13")
      val sup = t(s, dir, "supplier")
      GraftDelta.toDelta(sup.repartition(4), path)
      GraftDelta.toDelta(sup.repartition(4), path, mode = "append")
      val (before, after) = DeltaMaintenance.compact(s, path)
      val rows = GraftDelta.readDelta(s, path)
        .groupBy($"s_suppkey").agg(count(lit(1)).as("n"), sum(cents($"s_acctbal")).as("bal_c"))
      rows.withColumn("files_before", lit(before.toLong))
        .withColumn("files_after", lit(after.toLong))
        .orderBy($"s_suppkey")
    }),

    // DELETE: partition-drop fast path ('F' files removed unread) OR'd
    // with a data predicate (partial files rewritten); verifies the
    // surviving rows AND the deleted-row metric against the oracle.
    "d14_delete" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d14")
      GraftDelta.toDelta(t(s, dir, "orders"), path, partitionBy = Seq("o_orderstatus"))
      val res = GraftDelta.deleteWhere(s, path, Seq(
        Seq(Predicate("o_orderstatus", "==", "F")),
        Seq(Predicate("o_totalprice", ">", 150000.0))))
      GraftDelta.readDelta(s, path)
        .select($"o_orderkey", $"o_orderstatus", cents($"o_totalprice").as("total_c"))
        .withColumn("n_deleted", lit(res.affectedRows))
        .orderBy($"o_orderkey")
    }),

    // UPDATE: targeted in-place correction; only files containing
    // matching rows are rewritten. Verifies values AND the updated-row
    // metric.
    "d15_update" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d15")
      GraftDelta.toDelta(
        t(s, dir, "supplier").repartitionByRange(4, $"s_nationkey"), path)
      val res = GraftDelta.updateWhere(s, path,
        Seq(Seq(Predicate("s_nationkey", "<", 5))),
        Map("s_acctbal" -> ($"s_acctbal" + 100.0)))
      GraftDelta.readDelta(s, path)
        .select($"s_suppkey", $"s_nationkey", cents($"s_acctbal").as("acctbal_c"))
        .withColumn("n_updated", lit(res.affectedRows))
        .orderBy($"s_suppkey")
    }),

    // MERGE upsert: updates OR'd with fresh keys in one source; verifies
    // surviving values plus matched/inserted metrics.
    "d16_merge" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d16")
      val c = t(s, dir, "customer")
      GraftDelta.toDelta(c.repartitionByRange(4, $"c_custkey"), path)
      val updates = c.filter($"c_custkey" <= 300)
        .withColumn("c_acctbal", $"c_acctbal" + 1000.0)
      val inserts = c.filter($"c_custkey" <= 50)
        .withColumn("c_custkey", $"c_custkey" + 1000000L)
        .withColumn("c_name", lit("new customer"))
      val res = GraftDelta.mergeInto(s, path, updates.unionByName(inserts),
        on = Seq("c_custkey"))
      GraftDelta.readDelta(s, path)
        .select($"c_custkey", $"c_name", $"c_nationkey", cents($"c_acctbal").as("acctbal_c"))
        .withColumn("n_matched", lit(res.matchedRows))
        .withColumn("n_inserted", lit(res.insertedRows))
        .orderBy($"c_custkey")
    }),

    // RESTORE TO VERSION: append + delete mutate the table, then one
    // RESTORE commit returns it to the original state — readback must
    // equal the untouched source table; history is preserved (the
    // restore is version 3, pinned via the surfaced version column).
    "d17_restore" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d17")
      val c = t(s, dir, "customer")
      GraftDelta.toDelta(c.repartition(4), path)                     // v0
      GraftDelta.toDelta(
        c.filter($"c_custkey" <= 200).withColumn("c_custkey", $"c_custkey" + 1000000L),
        path, mode = "append")                                       // v1
      GraftDelta.deleteWhere(s, path,
        Seq(Seq(Predicate("c_custkey", ">", 500L))))                 // v2
      val res = GraftDelta.restore(s, path, 0L)                      // v3
      GraftDelta.readDelta(s, path)
        .select($"c_custkey", $"c_name", $"c_nationkey", cents($"c_acctbal").as("acctbal_c"))
        .withColumn("restore_version", lit(res.tableVersion))
        .orderBy($"c_custkey")
    }),

    // Batch change feed: rows added per commit in (0, head], stamped
    // with _commit_version; the dataChange=false OPTIMIZE rewrite (v3)
    // must contribute NO rows — re-ingesting a compaction would
    // duplicate the whole table.
    "d18_table_changes" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d18")
      val o = t(s, dir, "orders")
      GraftDelta.toDelta(o.filter($"o_orderkey" < 3000).repartition(4), path) // v0
      GraftDelta.toDelta(o.filter($"o_orderkey" >= 3000 && $"o_orderkey" < 6000)
        .repartition(4), path, mode = "append")                               // v1
      GraftDelta.toDelta(o.filter($"o_orderkey" >= 6000)
        .repartition(4), path, mode = "append")                               // v2
      DeltaMaintenance.compact(s, path)                                       // v3
      GraftDelta.tableChanges(s, path, fromVersion = 0L)
        .select($"o_orderkey", $"o_orderstatus", cents($"o_totalprice").as("total_c"),
          $"_change_type", $"_commit_version")
        .orderBy($"o_orderkey")
    }),

    // Change feed over DELETION-VECTOR commits (the 100 TB DML flavor):
    // v1 DV-deletes negative-balance customers, v2 DV-updates low-nation
    // ones — the feed emits exactly the soft-deleted rows (newDV ∖ oldDV
    // bitmap diff scanned back out of the immutable files) as 'delete'
    // and the v2 appended postimages as 'insert'. Predicates are spread
    // across every custkey-ranged file, so no file fully matches (a full
    // match would legally promote to a rewrite remove).
    "d28_dv_changes" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d28")
      val c = t(s, dir, "customer")
      GraftDelta.toDelta(c.repartitionByRange(4, $"c_custkey"), path)     // v0
      GraftDelta.deleteWhereWithDv(s, path,
        Seq(Seq(Predicate("c_acctbal", "<", 0.0))))                       // v1
      GraftDelta.updateWhereWithDv(s, path,
        Seq(Seq(Predicate("c_nationkey", "<", 5))),
        Map("c_acctbal" -> (col("c_acctbal") + 100)))                     // v2
      GraftDelta.tableChanges(s, path, fromVersion = 0L)
        .select($"c_custkey", $"c_nationkey", cents($"c_acctbal").as("acctbal_c"),
          $"_change_type", $"_commit_version")
        .orderBy($"_commit_version", $"_change_type", $"c_custkey")
    }),

    // Column-mapping write surface: (a) name mode — our table upgraded
    // in place (enableColumnMapping stamps ids + physicalName=old name),
    // then RENAME + DROP COLUMN as metadata-only commits; (b) id mode —
    // a foreign-shaped table whose parquet files carry FIELD IDS under
    // arbitrary physical names, read via Spark's field-id matching and
    // renamed the same metadata-only way. Both read back logically.
    "d29_column_rename" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.types._
      val c = t(s, dir, "customer")
      // (a) name mode
      val p1 = tmp("d29a")
      GraftDelta.toDelta(c.repartition(2), p1)                        // v0
      GraftDelta.enableColumnMapping(s, p1)                           // v1
      GraftDelta.renameColumn(s, p1, "c_acctbal", "balance")          // v2
      GraftDelta.dropColumn(s, p1, "c_mktsegment")                    // v3
      // mapped APPEND with the post-rename logical schema: the staged
      // file carries physical names; read-back must re-surface logical
      GraftDelta.toDelta(
        c.filter($"c_custkey" <= 100)
          .select(($"c_custkey" + 1000000L).as("c_custkey"), $"c_name",
            $"c_nationkey", ($"c_acctbal" + 50).as("balance")),
        p1, mode = "append")                                          // v4
      val nameMode = GraftDelta.readDelta(s, p1)
        .select($"c_custkey".cast("long").as("key"),
          cents($"balance").as("bal_c"))
        .withColumn("mode", lit("name"))
      // (b) id mode (foreign fixture: field ids are the binding contract)
      val p2 = tmp("d29b")
      val fid = (n: Long) => new MetadataBuilder().putLong("parquet.field.id", n).build()
      val writeSchema = StructType(Seq(
        StructField("col-1", LongType, nullable = true, fid(1)),
        StructField("col-2", DoubleType, nullable = true, fid(2))))
      val phys = s.createDataFrame(
        c.select($"c_custkey".cast("long"), $"c_acctbal".cast("double")).rdd, writeSchema)
      phys.coalesce(2).write.parquet(s"$p2/data")
      val cmField = (logical: String, physical: String, dt: DataType, id: Long) =>
        StructField(logical, dt, nullable = true,
          new MetadataBuilder()
            .putLong("delta.columnMapping.id", id)
            .putString("delta.columnMapping.physicalName", physical).build())
      val logical = StructType(Seq(
        cmField("custkey", "col-1", LongType, 1),
        cmField("acctbal", "col-2", DoubleType, 2)))
      val adds = new java.io.File(s"$p2/data").listFiles()
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
        .map(f => graft.delta.AddFile(path = s"data/${f.getName}", size = f.length(),
          modificationTime = f.lastModified(), dataChange = true)).toSeq
      DeltaLog.forTable(s, p2).writeCommit(0L,
        Seq(graft.delta.CommitInfo(System.currentTimeMillis(), "CREATE"),
          graft.delta.Protocol(2, 5),
          graft.delta.MetadataAction(id = "d29-id-mode", schemaString = logical.json,
            configuration = Map("delta.columnMapping.mode" -> "id",
              "delta.columnMapping.maxColumnId" -> "2"))) ++ adds)     // v0
      GraftDelta.renameColumn(s, p2, "acctbal", "balance")             // v1
      val idMode = GraftDelta.readDelta(s, p2)
        .select($"custkey".as("key"), cents($"balance").as("bal_c"))
        .withColumn("mode", lit("id"))
      nameMode.unionByName(idMode).orderBy($"mode", $"key")
    }),

    // CHANGE DATA FEED: delta.enableChangeDataFeed=true makes every
    // row-removing write record its exact changes as `cdc` actions under
    // _change_data/ — v2 is a REWRITE delete (previously inexpressible
    // per-row: the rewritten file's surviving rows would read back as
    // inserts), v3 a DV update with pre/postimages, v4 a MERGE mixing
    // updates and inserts. tableChanges serves the cdc files exclusively
    // for those commits; the oracle reconstructs all three change sets
    // from the source parquet. The 5-commit staging is memoized per
    // (sf dir, JVM): it is setup, not the operator under test — with
    // min-of-two bench passes the reported time is the change-feed READ,
    // not the CDF-recording writes (r7 VERDICT bench-hygiene item).
    "d30_cdf" -> ((s, dir) => {
      import s.implicits._
      val path = d30Staged.computeIfAbsent(dir, { d =>
        val p = tmp("d30")
        val sup = t(s, d, "supplier")
        GraftDelta.toDelta(sup.repartition(4), p)                      // v0
        GraftDelta.enableChangeDataFeed(s, p)                          // v1
        GraftDelta.deleteWhere(s, p,
          Seq(Seq(Predicate("s_acctbal", "<", 0.0))))                  // v2 rewrite
        GraftDelta.updateWhereWithDv(s, p,
          Seq(Seq(Predicate("s_nationkey", "<", 5))),
          Map("s_acctbal" -> (col("s_acctbal") + 10)))                 // v3 DV
        val mergeBase = sup.filter($"s_suppkey" <= 10 && $"s_acctbal" >= 0)
        GraftDelta.mergeInto(s, p,
          mergeBase.withColumn("s_acctbal", lit(55.0)).unionByName(
            mergeBase.withColumn("s_suppkey", $"s_suppkey" + 100000)),
          on = Seq("s_suppkey"))                                       // v4 merge
        p
      })
      GraftDelta.tableChanges(s, path, fromVersion = 1L)
        .select($"s_suppkey", $"s_nationkey", cents($"s_acctbal").as("bal_c"),
          $"_change_type", $"_commit_version")
        .orderBy($"_commit_version", $"_change_type", $"s_suppkey")
    }),

    // GENERATED COLUMNS (delta.generationExpression): v0 creates with
    // o_year provided (validated in-flight against year(o_orderdate)),
    // v1 appends WITHOUT the column (the writer computes it), v2 UPDATEs
    // the dependency o_orderdate on a slice — the rewrite must re-derive
    // o_year, not carry the stale value. Oracle recomputes end-state
    // years from the source parquet.
    "d31_generated" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.types.MetadataBuilder
      val path = tmp("d31")
      val o = t(s, dir, "orders")
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice", $"o_orderdate")
      val genMeta = new MetadataBuilder()
        .putString("delta.generationExpression", "year(o_orderdate)").build()
      GraftDelta.toDelta(
        o.filter($"o_orderkey" < 3000)
          .withColumn("o_year", year($"o_orderdate").as("o_year", genMeta)),
        path)                                                            // v0
      GraftDelta.toDelta(o.filter($"o_orderkey" >= 3000), path,
        mode = "append")                                                 // v1 computed
      GraftDelta.updateWhere(s, path,
        Seq(Seq(Predicate("o_orderkey", "<", 100L))),
        Map("o_orderdate" -> date_add($"o_orderdate", 400)))             // v2 re-derive
      GraftDelta.readDelta(s, path)
        .select($"o_orderkey", $"o_year", cents($"o_totalprice").as("total_c"))
        .orderBy($"o_orderkey")
    }),

    // IDENTITY COLUMNS (delta.identity.*, writer protocol 6): v0 creates
    // with seeded ids (BY DEFAULT accepts them; the create commit's
    // watermark covers the seed), v1 appends WITHOUT the column — the
    // writer allocates unique, step-aligned values above the watermark.
    // Allocation is nondeterministic by contract (gaps allowed), so the
    // query pins the STRUCTURE: totals, uniqueness, alignment, watermark
    // clearance — every one a constant DuckDB derives from orders alone.
    "d32_identity" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.types.MetadataBuilder
      val path = tmp("d32")
      val idMeta = new MetadataBuilder()
        .putLong("delta.identity.start", 1L)
        .putLong("delta.identity.step", 2L)
        .putBoolean("delta.identity.allowExplicitInsert", true).build()
      val o = t(s, dir, "orders").select($"o_orderkey", $"o_totalprice")
      val part1 = o.filter($"o_orderkey" < 3000)
      GraftDelta.toDelta(
        part1.withColumn("row_id",
          (lit(1L) + $"o_orderkey".cast("long") * 2L).as("row_id", idMeta)),
        path)                                                            // v0 seeded
      GraftDelta.toDelta(o.filter($"o_orderkey" >= 3000), path,
        mode = "append")                                                 // v1 allocated
      // the create commit's watermark: 1 + 2·max(seed orderkey)
      val seedHwm = part1.agg(max($"o_orderkey".cast("long"))).as[Long].head() * 2L + 1L
      GraftDelta.readDelta(s, path).agg(
        count(lit(1)).as("n_total"),
        countDistinct($"row_id").as("n_distinct_ids"),
        sum(when(($"row_id" - 1L) % 2L === 0L, 1L).otherwise(0L)).as("n_aligned"),
        sum(when($"o_orderkey" >= 3000 && $"row_id" > seedHwm, 1L).otherwise(0L))
          .as("n_alloc_above"),
        sum(cents($"o_totalprice")).as("total_c"))
    }),

    // ROW TRACKING (writer features rowTracking + domainMetadata): two
    // commits allocate disjoint watermarked id ranges; a DV DELETE hides
    // rows WITHOUT rewriting files, so every surviving row must keep the
    // exact id it had before — pinned by joining the pre- and post-delete
    // id maps (both scans capture their file/DV state eagerly). Raw id
    // VALUES depend on physical file layout, so the pins are structural:
    // counts, uniqueness, zero re-homed rows, business checksum.
    "d34_row_tracking" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d34")
      val o = t(s, dir, "orders").select($"o_orderkey", $"o_totalprice")
      GraftDelta.toDelta(o.filter($"o_orderkey" < 3000), path,
        configuration = Map("delta.enableRowTracking" -> "true"))         // v0
      GraftDelta.toDelta(o.filter($"o_orderkey" >= 3000), path,
        mode = "append")                                                  // v1
      val before = GraftDelta.readDeltaWithRowIds(s, path)
        .select($"o_orderkey", $"_row_id".as("id_before"))
      GraftDelta.deleteWhereWithDv(s, path,
        Seq(Seq(Predicate("o_orderkey", ">=", 1000L),
          Predicate("o_orderkey", "<", 2000L))))                          // v2
      val after = GraftDelta.readDeltaWithRowIds(s, path)
        .select($"o_orderkey", $"_row_id".as("id_after"),
          cents($"o_totalprice").as("c"))
      after.join(before, Seq("o_orderkey")).agg(
        count(lit(1)).as("n_rows"),
        countDistinct($"id_after").as("n_distinct_ids"),
        sum(when($"id_after" =!= $"id_before", 1L).otherwise(0L)).as("n_rehomed"),
        sum($"c").as("total_c"))
    }),

    // V2 CHECKPOINTS (reader feature v2Checkpoint): upgrade to reader-3,
    // checkpoint → uuid-named top file + sidecars under _sidecars/,
    // delete the pre-checkpoint JSON tail — the read can only succeed by
    // replaying through the v2 checkpoint (top → sidecar adds).
    "d35_v2_checkpoint" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d35")
      val sup = t(s, dir, "supplier")
      GraftDelta.toDelta(sup.filter($"s_suppkey" % 3 === 0), path)        // v0
      GraftDelta.toDelta(sup.filter($"s_suppkey" % 3 === 1), path,
        mode = "append")                                                  // v1
      val log0 = DeltaLog.forTable(s, path)
      val snap = log0.snapshot(None)
      log0.writeCommit(snap.version + 1, Seq(
        CommitInfo(System.currentTimeMillis(), "UPGRADE PROTOCOL"),
        Protocol(3, 7,
          readerFeatures = Some(Seq("v2Checkpoint")),
          writerFeatures = Some(DeltaLog.legacyWriterFeatures(snap.protocol))))) // v2
      GraftDelta.toDelta(sup.filter($"s_suppkey" % 3 === 2), path,
        mode = "append")                                                  // v3
      val log = DeltaLog.forTable(s, path)
      log.writeCheckpoint(3L)
      (0L to 2L).foreach(v => log.fs.delete(log.commitFile(v), false))
      // replay must succeed through the V2 checkpoint ALONE — clear the
      // snapshot cache so a hit can't stand in for the uuid+sidecar read
      DeltaLog.clearCache()
      GraftDelta.readDelta(s, path)
        .select($"s_suppkey", $"s_name", cents($"s_acctbal").as("acctbal_c"))
        .orderBy($"s_suppkey")
    }),

    // SQL-STRING COMMAND SURFACE: the same DML semantics driven through
    // GraftSql.sql statements (DELETE + UPDATE with WHERE → DNF), read
    // back and mirrored by DuckDB applying the equivalent transforms.
    "d36_sql_dml" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d36")
      GraftDelta.toDelta(t(s, dir, "customer"), path)                     // v0
      graft.sql.GraftSql.sql(s,
        s"DELETE FROM delta.`$path` WHERE c_acctbal < 0")                 // v1
      graft.sql.GraftSql.sql(s,
        s"UPDATE delta.`$path` SET c_mktsegment = 'SQLSEG' " +
          "WHERE c_nationkey = 3 OR c_nationkey = 7")                     // v2
      GraftDelta.readDelta(s, path)
        .select($"c_custkey", $"c_nationkey", $"c_mktsegment",
          cents($"c_acctbal").as("acctbal_c"))
        .orderBy($"c_custkey")
    }),

    // TIMESTAMP_NTZ (reader+writer feature timestampNtz): lineitem's
    // l_shipdate is physically NTZ — the staged table must keep the
    // type (no UTC coercion), stamp the feature, and survive predicate
    // DML on the NTZ column; the readback hash covers the raw values.
    "d37_ntz" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d37")
      val li = t(s, dir, "lineitem")
        .filter($"l_orderkey" % 7 === 0)
        .select($"l_orderkey", $"l_linenumber", $"l_shipdate",
          cents($"l_quantity").as("qty_c"))
      GraftDelta.toDelta(li, path)                                        // v0
      GraftDelta.deleteWhere(s, path,
        Seq(Seq(Predicate("l_shipdate", "<", "1995-01-01 00:00:00"))))    // v1
      val snap = DeltaLog.forTable(s, path).snapshot(None)
      require(snap.protocol.readerFeatures.exists(_.contains("timestampNtz")),
        s"NTZ table must declare the feature: ${snap.protocol}")
      require(snap.schema("l_shipdate").dataType ==
        org.apache.spark.sql.types.TimestampNTZType,
        s"schema must keep timestamp_ntz: ${snap.schema("l_shipdate").dataType}")
      GraftDelta.readDelta(s, path)
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    // TYPE WIDENING (reader feature typeWidening): v0 writes s_suppkey
    // as INT, a widen commit flips the declared type to LONG with
    // per-field delta.typeChanges metadata, and a foreign-style hand
    // commit adds a physically-long file — the scan must read BOTH
    // through the current schema (Spark's vectorized parquet reader
    // performs the int32→int64 widening; no per-file casts planned).
    "d38_type_widening" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.types._
      val path = tmp("d38")
      val sup = t(s, dir, "supplier")
      GraftDelta.toDelta(
        sup.filter($"s_suppkey" % 2 === 0)
          .select($"s_suppkey".cast("int").as("s_suppkey"), $"s_name",
            cents($"s_acctbal").as("acctbal_c")),
        path)                                                             // v0: int key
      val log = DeltaLog.forTable(s, path)
      val snap = log.snapshot(None)
      val widened = StructType(snap.schema.fields.map { f =>
        if (f.name == "s_suppkey")
          StructField("s_suppkey", LongType, nullable = true,
            new MetadataBuilder().withMetadata(f.metadata)
              .putMetadataArray("delta.typeChanges", Array(
                new MetadataBuilder().putString("fromType", "integer")
                  .putString("toType", "long").build())).build())
        else f
      })
      log.writeCommit(1L, Seq(
        CommitInfo(System.currentTimeMillis(), "WIDEN"),
        Protocol(3, 7,
          readerFeatures = Some(Seq("typeWidening")),
          writerFeatures = Some(
            (DeltaLog.legacyWriterFeatures(snap.protocol) :+ "typeWidening").distinct)),
        snap.metadata.copy(schemaString = widened.json)))                 // v1
      // physically-long file, committed the way a feature-native foreign
      // writer would
      val stage = java.nio.file.Files.createTempDirectory("graft_d38_stage")
      stage.toFile.deleteOnExit()
      sup.filter($"s_suppkey" % 2 === 1)
        .select($"s_suppkey", $"s_name", cents($"s_acctbal").as("acctbal_c"))
        .coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = new java.io.File(stage.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val destName = s"part-widened-${java.util.UUID.randomUUID()}.parquet"
      java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(path, destName))
      log.writeCommit(2L, Seq(
        CommitInfo(System.currentTimeMillis(), "WRITE"),
        AddFile(destName, Map.empty,
          new java.io.File(path, destName).length(),
          System.currentTimeMillis(), dataChange = true)))                // v2
      GraftDelta.readDelta(s, path).orderBy($"s_suppkey")
    }),

    // ALTER TABLE ADD COLUMN — metadata-only schema evolution through
    // the SQL surface: pre-add files surface the new (middle-ordered)
    // column as null, a positional INSERT fills it, and the readback
    // hash covers ordering + nulls + the inserted values.
    "d39_add_column" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d39")
      GraftDelta.toDelta(t(s, dir, "nation"), path)                       // v0
      graft.sql.GraftSql.sql(s,
        s"ALTER TABLE delta.`$path` ADD COLUMN note STRING AFTER n_name") // v1
      graft.sql.GraftSql.sql(s,
        s"INSERT INTO delta.`$path` VALUES " +
          "(901, 'NEWLAND', 'added', 0), (902, 'OLDLAND', 'added', 1)")   // v2
      GraftDelta.readDelta(s, path).orderBy($"n_nationkey")
    }),

    // SQL TIME-FUNCTION WHERE: `year(col)` / `to_date(col)` conjuncts
    // rewrite to EXACT ranges on the column (they used to refuse) — the
    // DELETE must remove exactly 1995, and the COUNT answers through the
    // metadata path with the same rewrite. Files are range-partitioned
    // on the date so the rewritten predicate also prunes at the log
    // level (pinned in GraftSqlSpec; here the oracle checks semantics).
    "d41_sql_time_fn" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d41")
      GraftDelta.toDelta(
        t(s, dir, "orders").repartitionByRange(6, $"o_orderdate"), path)
      graft.sql.GraftSql.sql(s,
        s"DELETE FROM delta.`$path` WHERE year(o_orderdate) = 1995")
      val mar1996 = graft.sql.GraftSql.sql(s,
        s"SELECT COUNT(*) AS n FROM delta.`$path` " +
          "WHERE to_date(o_orderdate) = DATE '1996-03-15'")
        .head().getLong(0)
      GraftDelta.readDelta(s, path)
        .groupBy(year($"o_orderdate").cast("long").as("yr"))
        .agg(count(lit(1)).as("n"), sum(cents($"o_totalprice")).as("total_c"))
        .withColumn("n_mar15_1996", lit(mar1996))
        .orderBy($"yr")
    }),

    // CATALOG-NAMED TABLES: CREATE TABLE name USING graft LOCATION p,
    // then name-addressed DML through GraftSql and a name-addressed
    // spark.table read — one engine path for both addressings, with the
    // relation cache refreshed so the read sees post-DML state.
    "d40_catalog_table" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d40")
      GraftDelta.toDelta(t(s, dir, "customer"), path)
      s.sql("DROP TABLE IF EXISTS graft_d40")
      s.sql(s"CREATE TABLE graft_d40 USING graft LOCATION '$path'")
      graft.sql.GraftSql.sql(s, "DELETE FROM graft_d40 WHERE c_acctbal < 0")
      graft.sql.GraftSql.sql(s,
        "UPDATE graft_d40 SET c_mktsegment = 'CAT' WHERE c_nationkey = 5")
      s.table("graft_d40")
        .select($"c_custkey", $"c_nationkey", $"c_mktsegment",
          cents($"c_acctbal").as("acctbal_c"))
        .orderBy($"c_custkey")
    }),

    // TBLPROPERTIES lifecycle through the SQL surface: SET three
    // properties, UNSET one, SHOW the survivors — metadata-only commits,
    // introspection straight off the snapshot (no data I/O at any size).
    "d42_tblproperties" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d42")
      GraftDelta.toDelta(t(s, dir, "region"), path)
      graft.sql.GraftSql.sql(s, s"ALTER TABLE delta.`$path` SET TBLPROPERTIES " +
        "('team' = 'data', 'tier' = 'gold', 'ttl' = '30d')")
      graft.sql.GraftSql.sql(s,
        s"ALTER TABLE delta.`$path` UNSET TBLPROPERTIES ('ttl')")
      graft.sql.GraftSql.sql(s, s"SHOW TBLPROPERTIES delta.`$path`")
        .orderBy($"key")
    }),

    // WRITER-SIDE TYPE WIDENING: the engine's own ALTER COLUMN TYPE
    // (d38 covers the foreign/reader side) — INT files under a widened
    // BIGINT schema plus a post-widen LONG append read back as one table.
    "d45_widen_column" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d45")
      GraftDelta.toDelta(
        t(s, dir, "nation").select($"n_nationkey".cast("int").as("n_nationkey"),
          $"n_name"), path)                                             // v0: INT key
      graft.sql.GraftSql.sql(s,
        s"ALTER TABLE delta.`$path` ALTER COLUMN n_nationkey TYPE BIGINT") // v1
      GraftDelta.toDelta(
        t(s, dir, "nation")
          .select(($"n_nationkey" + 1000L).as("n_nationkey"), $"n_name"),
        path, mode = "append")                                          // v2: LONG
      GraftDelta.readDelta(s, path).orderBy($"n_nationkey")
    }),

    // DEEP CLONE: an independent physical copy — after the clone, every
    // SOURCE data file is deleted from disk; the clone must still read
    // the full snapshot (zero storage sharing). The in-query require
    // pins clone-root-relative adds.
    "d48_deep_clone" -> ((s, dir) => {
      import s.implicits._
      val src = tmp("d48src")
      val clone = tmp("d48")
      GraftDelta.toDelta(t(s, dir, "supplier").repartition(4), src)     // v0
      GraftDelta.deleteWhere(s, src,
        Seq(Seq(Predicate("s_nationkey", "==", 0L))))                   // v1
      graft.sql.GraftSql.sql(s,
        s"CREATE TABLE delta.`$clone` DEEP CLONE delta.`$src`")
      val snap = DeltaLog.forTable(s, clone).snapshot(None)
      require(snap.activeFiles.forall(f => !f.path.startsWith("/")),
        "deep-clone adds must be clone-root relative")
      // obliterate the source's data files: only the clone's bytes remain
      new java.io.File(src).listFiles().filter(_.getName.endsWith(".parquet"))
        .foreach(_.delete())
      GraftDelta.readDelta(s, clone)
        .select($"s_suppkey", $"s_nationkey", $"s_name",
          cents($"s_acctbal").as("acctbal_c"))
        .orderBy($"s_suppkey")
    }),

    // DML + OPTIMIZE on a COLUMN-MAPPED table: the foreign-table shape
    // any renamed-column delta-spark table carries. Upgrade in place →
    // RENAME → predicate DELETE and UPDATE addressing the RENAMED
    // logical name (rewrites stage physical-named files) → OPTIMIZE
    // compacts through the same mapped machinery. The oracle mirrors
    // delete-then-update over the raw source.
    "d49_mapped_dml" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d49")
      GraftDelta.toDelta(t(s, dir, "customer").repartition(4), path)     // v0
      GraftDelta.enableColumnMapping(s, path)                            // v1
      GraftDelta.renameColumn(s, path, "c_acctbal", "balance")           // v2
      GraftDelta.deleteWhere(s, path,
        Seq(Seq(Predicate("balance", "<", 0.0))))                        // v3
      GraftDelta.updateWhere(s, path,
        Seq(Seq(Predicate("c_nationkey", "<", 5))),
        Map("balance" -> (col("balance") + 100)))                        // v4
      val (nBefore, nAfter) = DeltaMaintenance.compact(s, path)          // v5
      require(nAfter < nBefore, s"OPTIMIZE must compact: $nBefore -> $nAfter")
      val snap = DeltaLog.forTable(s, path).snapshot(None)
      require(snap.metadata.configuration.get("delta.columnMapping.mode")
        .contains("name"), "table must stay column-mapped")
      GraftDelta.readDelta(s, path)
        .select($"c_custkey".cast("long").as("key"), $"c_nationkey",
          cents($"balance").as("bal_c"))
        .orderBy($"key")
    }),

    // MULTI-CLAUSE MERGE: ordered conditioned WHEN MATCHED clauses
    // (first-match-wins) + WHEN NOT MATCHED BY SOURCE delete/update —
    // the delta-spark clause surface over the CDC-apply shape. The
    // oracle mirrors the whole dispatch as CASE/WHERE over the raw
    // source: matched rows (key % 3 = 0) delete when negative, get the
    // source balance +1000 when nationkey < 10, else bump by 5; rows
    // the source no longer carries delete when nationkey >= 20, else
    // age out their segment.
    "d50_merge_clauses" -> ((s, dir) => {
      import s.implicits._
      import graft.delta.DeltaDml
      val path = tmp("d50")
      val c = t(s, dir, "customer")
      GraftDelta.toDelta(c.repartition(4), path)                         // v0
      val src = c.filter($"c_custkey" % 3 === 0)
        .select($"c_custkey", $"c_acctbal", $"c_nationkey")
      DeltaDml.mergeClauses(s, path, src, Seq("c_custkey"),
        matched = Seq(
          DeltaDml.MatchedClause(DeltaDml.WhenMatched.Delete,
            Some(DeltaDml.src("c_acctbal") < 0.0)),
          DeltaDml.MatchedClause(DeltaDml.WhenMatched.Update(
            Map("c_acctbal" -> (DeltaDml.src("c_acctbal") + 1000.0))),
            Some(DeltaDml.src("c_nationkey") < 10)),
          DeltaDml.MatchedClause(DeltaDml.WhenMatched.Update(
            Map("c_acctbal" -> (col("c_acctbal") + 5.0))))),
        insertNotMatched = false,
        bySource = Seq(
          DeltaDml.BySourceClause(DeltaDml.BySourceAction.Delete,
            Some(col("c_nationkey") >= 20)),
          DeltaDml.BySourceClause(DeltaDml.BySourceAction.Update(
            Map("c_mktsegment" -> lit("AGED"))))))                       // v1
      GraftDelta.readDelta(s, path)
        .select($"c_custkey".cast("long").as("key"), $"c_nationkey",
          cents($"c_acctbal").as("bal_c"), $"c_mktsegment".as("seg"))
        .orderBy($"key")
    }),

    // CHANGE DATA FEED on a COLUMN-MAPPED table: the cdc plane stores
    // PHYSICAL column names (like the data plane) and the feed renames
    // back to the logical schema — rewrite DELETE cdc rows and DV UPDATE
    // pre/post images addressed by the RENAMED column, vs a DuckDB
    // reconstruction of both change sets from the raw source.
    "d51_mapped_cdf" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d51")
      GraftDelta.toDelta(t(s, dir, "supplier").repartition(4), path,
        configuration = Map("delta.enableChangeDataFeed" -> "true"))     // v0
      GraftDelta.enableColumnMapping(s, path)                            // v1
      GraftDelta.renameColumn(s, path, "s_acctbal", "balance")           // v2
      GraftDelta.deleteWhere(s, path,
        Seq(Seq(Predicate("balance", "<", 0.0))))                        // v3 rewrite cdc
      GraftDelta.updateWhereWithDv(s, path,
        Seq(Seq(Predicate("s_nationkey", "<", 5))),
        Map("balance" -> (col("balance") + 100)))                        // v4 DV cdc
      GraftDelta.tableChanges(s, path, fromVersion = 2L)
        .select($"s_suppkey", $"s_nationkey", cents($"balance").as("bal_c"),
          $"_change_type", $"_commit_version")
        .orderBy($"_commit_version", $"_change_type", $"s_suppkey")
    }),

    // ROW TRACKING × COLUMN MAPPING: the two features on ONE table — the
    // default shape of newer delta-spark runtimes. Mapped + renamed →
    // enable tracking (backfill) → DV DELETE (ids must survive: files
    // untouched) → OPTIMIZE (ids preserved via PHYSICAL materialized
    // columns riding outside the mapped schema) → rename AGAIN (binding
    // is by physical parquet name, so the rename can't re-home an id).
    // Pins are structural like d34: counts, uniqueness, zero re-homed
    // rows, business checksum.
    "d52_rt_mapping" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d52")
      val c = t(s, dir, "customer")
        .select($"c_custkey", $"c_acctbal", $"c_nationkey")
      GraftDelta.toDelta(c.repartition(4), path)                         // v0
      GraftDelta.enableColumnMapping(s, path)                            // v1
      GraftDelta.renameColumn(s, path, "c_acctbal", "balance")           // v2
      GraftDelta.enableRowTracking(s, path)                              // v3
      val before = GraftDelta.readDeltaWithRowIds(s, path)
        .select($"c_custkey", $"_row_id".as("id_before"))
      GraftDelta.deleteWhereWithDv(s, path,
        Seq(Seq(Predicate("balance", "<", 0.0))))                        // v4
      val (nBefore, nAfter) = DeltaMaintenance.compact(s, path)          // v5
      require(nAfter < nBefore, s"OPTIMIZE must compact: $nBefore -> $nAfter")
      GraftDelta.renameColumn(s, path, "balance", "bal")                 // v6
      val after = GraftDelta.readDeltaWithRowIds(s, path)
        .select($"c_custkey", $"_row_id".as("id_after"),
          cents($"bal").as("bal_c"))
      after.join(before, Seq("c_custkey")).agg(
        count(lit(1)).as("n_rows"),
        countDistinct($"id_after").as("n_distinct_ids"),
        sum(when($"id_after" =!= $"id_before", 1L).otherwise(0L)).as("n_rehomed"),
        sum($"bal_c").as("total_c"))
    }),

    // REORG TABLE ... APPLY (PURGE): the physical-erasure companion to
    // DV DML — rewrites exactly the DV-carrying files with their
    // soft-deleted rows materialized away. In-query pins: DV-less files
    // survive by IDENTITY (purge is scoped, not a full rewrite), every
    // DV file is swapped out, and the post-purge snapshot carries zero
    // DVs. Oracle = the surviving rows (visible data must not change).
    "d53_reorg_purge" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d53")
      // range-layout on the DELETE key: some files match (gain DVs),
      // others provably contain no match (must survive untouched)
      GraftDelta.toDelta(
        t(s, dir, "customer").repartitionByRange(6, $"c_acctbal"), path) // v0
      val r = GraftDelta.deleteWhereWithDv(s, path,
        Seq(Seq(Predicate("c_acctbal", "<", 0.0))))                      // v1
      require(r.rewrittenFiles == 0, s"DV delete must not rewrite files: $r")
      val log = DeltaLog.forTable(s, path)
      val pre = log.snapshot(None)
      val (dvFiles, cleanFiles) =
        pre.activeFiles.partition(_.deletionVector.isDefined)
      require(dvFiles.nonEmpty && cleanFiles.nonEmpty,
        s"staging must yield both DV and clean files: " +
          s"${dvFiles.size} dv / ${cleanFiles.size} clean")
      graft.sql.GraftSql.sql(s, s"REORG TABLE delta.`$path` APPLY (PURGE)") // v2
      val post = log.snapshot(None)
      require(post.activeFiles.forall(_.deletionVector.isEmpty),
        "REORG (PURGE) must leave no deletion vectors")
      val postPaths = post.activeFiles.map(_.path).toSet
      require(cleanFiles.forall(f => postPaths.contains(f.path)),
        "purge must not touch DV-less files")
      require(dvFiles.forall(f => !postPaths.contains(f.path)),
        "purge must replace every DV-carrying file")
      require(log.snapshot(None).version == pre.version + 1,
        "purge commits exactly once")
      GraftDelta.readDelta(s, path)
        .select($"c_custkey", $"c_name", cents($"c_acctbal").as("acctbal_c"))
        .withColumn("n_deleted", lit(r.affectedRows))
        .orderBy($"c_custkey")
    }),

    // DROP FEATURE (protocol downgrade, TRUNCATE HISTORY): the full DV
    // lifecycle — enable via DV delete, physically erase via REORG
    // purge, then drop the feature. In-query pins: the downgraded
    // protocol no longer lists deletionVectors, replay starts from the
    // drop-version checkpoint (every earlier commit JSON is GONE), and
    // time travel into the truncated history refuses. Oracle = the rows
    // a DV-unaware reader must now see through the plain replay.
    "d55_drop_feature" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d55")
      GraftDelta.toDelta(
        t(s, dir, "orders").repartitionByRange(4, $"o_orderkey"), path)  // v0
      val del = GraftDelta.deleteWhereWithDv(s, path,
        Seq(Seq(Predicate("o_totalprice", "<", 50000.0))))               // v1
      require(del.rewrittenFiles == 0 && del.affectedRows > 0)
      graft.sql.GraftSql.sql(s, s"REORG TABLE delta.`$path` APPLY (PURGE)") // v2
      val row = graft.sql.GraftSql.sql(s,
        s"ALTER TABLE delta.`$path` DROP FEATURE deletionVectors TRUNCATE HISTORY")
        .collect().head                                                 // v3
      require(row.getAs[Long]("tableVersion") == 3L &&
        row.getAs[Int]("removedLogFiles") > 0, row.toString)
      val log = DeltaLog.forTable(s, path)
      val p = log.snapshot(None).protocol
      require(!p.readerFeatures.exists(_.contains("deletionVectors")) &&
        !p.writerFeatures.exists(_.contains("deletionVectors")),
        s"feature must be gone: $p")
      require(log.listCommitVersions == Seq(3L),
        s"history must be truncated: ${log.listCommitVersions}")
      val travelRefused =
        try { GraftDelta.readDelta(s, path, version = Some(0L)).count(); false }
        catch { case _: Exception => true }
      require(travelRefused, "time travel into truncated history must refuse")
      // the pin is a replay STARTING at the drop-version checkpoint with
      // every earlier commit gone — not a snapshot-cache hit
      DeltaLog.clearCache()
      GraftDelta.readDelta(s, path)
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          cents($"o_totalprice").as("total_c"))
        .orderBy($"o_orderkey")
    }),

    // Orphan-file vacuum (directory-listing mode): crashed-write debris
    // — parquet staged by a failed job, never committed — is invisible
    // to the log-tracked tombstone vacuum and leaks forever. Orphan mode
    // lists the table root, subtracts every path ANY retained log file
    // references, and reclaims the aged unreferenced remainder. Pinned
    // in-query: aged orphans (root + partition dir) are found by dry-run
    // and deleted; a YOUNG orphan (indistinguishable from a concurrent
    // writer's staging) survives; an ACTIVE file and the LIVE DV file
    // survive on reference-protection despite ancient mtimes; hidden
    // trees are untouchable. Readback after deletion proves the table
    // intact.
    "d56_vacuum_orphans" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d56")
      GraftDelta.toDelta(
        t(s, dir, "customer").withColumn("seg", substring($"c_mktsegment", 1, 1)),
        path, partitionBy = Seq("seg"))                                  // v0
      val del = GraftDelta.deleteWhereWithDv(s, path,
        Seq(Seq(Predicate("c_acctbal", "<", 0.0))))                      // v1
      require(del.affectedRows > 0 && del.rewrittenFiles == 0)
      val oldMs = System.currentTimeMillis() - 10L * 24 * 3600 * 1000
      def plant(rel: String, aged: Boolean): Unit = {
        val f = new java.io.File(path, rel)
        f.getParentFile.mkdirs()
        val out = new java.io.FileOutputStream(f)
        out.write("debris".getBytes); out.close()
        if (aged) require(f.setLastModified(oldMs))
      }
      plant("part-crashed-root.snappy.parquet", aged = true)
      plant("seg=A/part-crashed-part.snappy.parquet", aged = true)
      plant("part-staged-young.snappy.parquet", aged = false)
      plant("_staging/leftover.parquet", aged = true)
      val snap = DeltaLog.forTable(s, path).snapshot(None)
      val activeAbs = new java.io.File(path, snap.activeFiles.head.path)
      val dvAbs = new java.io.File(path, snap.activeFiles
        .flatMap(_.deletionVector).filter(_.storageType == "u")
        .map(d => graft.delta.DeletionVectors.relativeDvName(d.pathOrInlineDv)).head)
      require(activeAbs.setLastModified(oldMs) && dvAbs.setLastModified(oldMs))
      require(GraftDelta.vacuum(s, path, 168.0, dryRun = true).isEmpty,
        "tombstone-only mode must not see orphans")
      val dry = GraftDelta.vacuum(s, path, 168.0, dryRun = true, includeOrphans = true)
      require(dry.size == 2, s"dry-run must name exactly the aged orphans: $dry")
      val deleted = GraftDelta.vacuum(s, path, 168.0, dryRun = false, includeOrphans = true)
      require(deleted.toSet == dry.toSet)
      require(!new java.io.File(path, "part-crashed-root.snappy.parquet").exists())
      require(new java.io.File(path, "part-staged-young.snappy.parquet").exists(),
        "in-retention orphan must survive")
      require(new java.io.File(path, "_staging/leftover.parquet").exists(),
        "hidden trees are never candidates")
      require(activeAbs.exists() && dvAbs.exists(),
        "referenced files survive any age")
      GraftDelta.readDelta(s, path)
        .select($"c_custkey", $"c_name", $"c_nationkey",
          cents($"c_acctbal").as("bal_c"),
          lit(deleted.size.toLong).as("orphans_removed"))
        .orderBy($"c_custkey")
    }),

    // Generalized DROP FEATURE: the metadata-only removals walk the full
    // lifecycle — enable changeDataFeed + rowTracking + inCommitTimestamps,
    // USE all three (an update writes cdc files, allocates row ids,
    // stamps in-commit timestamps), then drop them gate by gate:
    // property-enabled → refuse; CDF with cdc in retained history →
    // refuse without TRUNCATE HISTORY; after the drops the protocol
    // lists none of them, the enablement/marker properties are stripped,
    // the row-tracking watermark domain is evicted, and the table reads
    // foreign-plain.
    "d58_drop_features" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d58")
      GraftDelta.toDelta(
        t(s, dir, "supplier").repartitionByRange(2, $"s_suppkey"), path) // v0
      GraftDelta.enableChangeDataFeed(s, path)
      GraftDelta.enableRowTracking(s, path)
      val vIct = GraftDelta.enableInCommitTimestamps(s, path)
      GraftDelta.updateWhere(s, path,
        Seq(Seq(Predicate("s_suppkey", "<=", 5L))),
        Map("s_name" -> lit("updated")))
      require(GraftDelta.tableChanges(s, path, vIct)
        .filter($"_change_type" === "update_postimage").count() > 0, "CDF must be in use")
      val e0 = try { DeltaTableOps.dropFeature(s, path, "rowTracking"); "" }
               catch { case ex: IllegalArgumentException => ex.getMessage }
      require(e0.contains("still enabled"), e0)
      Seq("delta.enableChangeDataFeed", "delta.enableRowTracking",
        "delta.enableInCommitTimestamps").foreach(p =>
        DeltaTableOps.setTableProperties(s, path, Map(p -> "false")))
      val e1 = try { DeltaTableOps.dropFeature(s, path, "changeDataFeed"); "" }
               catch { case ex: IllegalArgumentException => ex.getMessage }
      require(e1.contains("TRUNCATE HISTORY"), e1)
      val rCdf = DeltaTableOps.dropFeature(s, path, "changeDataFeed",
        truncateHistory = true)
      require(rCdf.removedLogFiles > 0)
      DeltaTableOps.dropFeature(s, path, "rowTracking")
      DeltaTableOps.dropFeature(s, path, "inCommitTimestamps")
      val snap = DeltaLog.forTable(s, path).snapshot(None)
      val feats = snap.protocol.readerFeatures.toSeq.flatten ++
        snap.protocol.writerFeatures.toSeq.flatten
      // protocol feature names are SINGULAR (`inCommitTimestamp`) even
      // though the property is plural — asserting the plural here would
      // let a failed removal pass (ADVICE r13)
      require(!feats.exists(Set("changeDataFeed", "rowTracking", "inCommitTimestamp")),
        feats.toString)
      val cfg = snap.metadata.configuration
      require(!cfg.contains("delta.enableChangeDataFeed") &&
        !cfg.contains("delta.enableRowTracking") &&
        !cfg.keys.exists(_.startsWith("delta.rowTracking")) &&
        !cfg.contains("delta.enableInCommitTimestamps") &&
        !cfg.keys.exists(_.startsWith("delta.inCommitTimestamp")), cfg.toString)
      require(!snap.domainMetadata.contains("delta.rowTracking"),
        snap.domainMetadata.keys.toString)
      GraftDelta.readDelta(s, path)
        .select($"s_suppkey", $"s_nationkey",
          when($"s_name" === "updated", 1L).otherwise(0L).as("upd"))
        .orderBy($"s_suppkey")
    }),

    // DROP FEATURE for the file-format-coupled features (r13 VERDICT #4):
    // full lifecycle — enable v2Checkpoint (protocol upgrade) and USE it
    // (uuid+sidecar checkpoint on disk), widen s_suppkey int→long and USE
    // that (a long-backed post-widening append beside narrow-backed v0
    // files), then drop gate by gate: typeWidening with narrow-backed
    // active files → refuse naming the rewrite; after a full OPTIMIZE
    // rewrite, without TRUNCATE HISTORY → refuse (retained schema traces);
    // with TRUNCATE HISTORY → downgrade + per-field delta.typeChanges
    // stripped; v2Checkpoint drop → downgrade + the NEXT checkpoint is
    // CLASSIC; columnMapping → the named structural refusal. The table
    // then reads foreign-plain.
    "d59_drop_format_features" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d59")
      val sup = t(s, dir, "supplier")
      GraftDelta.toDelta(
        sup.select($"s_suppkey".cast("int").as("s_suppkey"), $"s_name",
          $"s_nationkey", $"s_acctbal").repartitionByRange(2, $"s_suppkey"),
        path)                                                            // v0
      val log0 = DeltaLog.forTable(s, path)
      val sn0 = log0.snapshot(None)
      log0.writeCommit(sn0.version + 1, Seq(
        CommitInfo(System.currentTimeMillis(), "UPGRADE PROTOCOL"),
        Protocol(3, 7,
          readerFeatures = Some(Seq("v2Checkpoint")),
          writerFeatures = Some(
            (DeltaLog.legacyWriterFeatures(sn0.protocol) :+ "v2Checkpoint")
              .distinct))))                                              // v1
      log0.writeCheckpoint(sn0.version + 1) // USE: uuid+sidecar on disk
      def uuidCheckpoints(): Seq[String] =
        new java.io.File(path, "_delta_log").listFiles()
          .map(_.getName).filter(_.matches(
            """\d{20}\.checkpoint\.[0-9a-fA-F-]{36}\.(parquet|json)""")).toSeq
      require(uuidCheckpoints().nonEmpty, "v2 checkpoint must be in use")
      DeltaTableOps.widenColumnType(s, path, "s_suppkey",
        org.apache.spark.sql.types.LongType)                             // v2
      GraftDelta.toDelta(
        sup.select(($"s_suppkey" + 10000L).as("s_suppkey"), $"s_name",
          $"s_nationkey", $"s_acctbal"),
        path, mode = "append")                                           // v3
      // gate 1: narrow-backed v0 files still active → refuse, name the fix
      val e0 = try { DeltaTableOps.dropFeature(s, path, "typeWidening"); "" }
               catch { case ex: IllegalArgumentException => ex.getMessage }
      require(e0.contains("pre-widening physical types"), e0)
      DeltaMaintenance.compact(s, path, minFilesToCompact = 1)           // v4
      // gate 2: footer probe now passes, retained traces still refuse
      val e1 = try { DeltaTableOps.dropFeature(s, path, "typeWidening"); "" }
               catch { case ex: IllegalArgumentException => ex.getMessage }
      require(e1.contains("TRUNCATE HISTORY"), e1)
      val rTw = DeltaTableOps.dropFeature(s, path, "typeWidening",
        truncateHistory = true)                                          // v5
      require(rTw.removedLogFiles > 0)
      // v2Checkpoint drop: no rewrite, no truncation — downgrade + the
      // checkpoint written at the drop version must be CLASSIC
      val uuidBefore = uuidCheckpoints().size
      DeltaTableOps.dropFeature(s, path, "v2Checkpoint")                 // v6
      require(uuidCheckpoints().size == uuidBefore,
        "v2Checkpoint drop must checkpoint CLASSIC, not another uuid file")
      // the named structural refusal
      val e2 = try { DeltaTableOps.dropFeature(s, path, "columnMapping"); "" }
               catch { case ex: IllegalArgumentException => ex.getMessage }
      require(e2.contains("not supported") && e2.contains("rewriting"), e2)
      val snap = DeltaLog.forTable(s, path).snapshot(None)
      val feats = snap.protocol.readerFeatures.toSeq.flatten ++
        snap.protocol.writerFeatures.toSeq.flatten
      require(!feats.exists(Set("typeWidening", "v2Checkpoint")), feats.toString)
      require(!snap.metadata.schemaString.contains("delta.typeChanges"),
        "typeChanges metadata must be stripped with the drop")
      require(snap.schema("s_suppkey").dataType ==
        org.apache.spark.sql.types.LongType, "widened type survives the drop")
      GraftDelta.readDelta(s, path)
        .select($"s_suppkey", $"s_name", cents($"s_acctbal").as("bal_c"))
        .orderBy($"s_suppkey")
    }),

    // Multi-writer conflict resolution (VERDICT r14 next-round #1): an
    // append and a partition-disjoint DELETE race the same version and
    // BOTH must commit — the loser detects no logical conflict with the
    // winner (the appended file's partition values exclude the DELETE's
    // predicate; the DELETE's removed files are untouched by the append)
    // and rebases at the new head instead of aborting. The race is
    // staged deterministically: a watcher thread fires the append the
    // moment the DELETE's rewrite staging dir appears — i.e. INSIDE the
    // window between the DELETE's snapshot and its commit attempt — and
    // either loser rebases, so the merged result is order-independent.
    "d60_concurrent_rebase" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d60")
      val base = t(s, dir, "customer").select(
        $"c_custkey".cast("long").as("c_custkey"), $"c_name",
        cents($"c_acctbal").as("bal_c"),
        ($"c_custkey" % 4).cast("string").as("p"))
      GraftDelta.toDelta(base, path, partitionBy = Seq("p"))             // v0
      val log = DeltaLog.forTable(s, path)
      val maxKey = base.agg(max($"c_custkey")).head().getLong(0)
      val k = maxKey / 2
      // the winner's REAL parquet file, fully staged before the race
      val stage = java.nio.file.Files.createTempDirectory("graft_d60_app")
      base.filter($"p" === "3")
        .select(($"c_custkey" + 1000000L).as("c_custkey"), $"c_name", $"bal_c")
        .coalesce(1).write.parquet(s"$stage/p")
      val part = new java.io.File(s"$stage/p").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val appended = new java.io.File(s"$path/p=3", "appended-d60.parquet")
      java.nio.file.Files.move(part.toPath, appended.toPath)
      val appendedAt = new java.util.concurrent.atomic.AtomicLong(-1L)
      val watcher = new Thread(() => {
        val root = new java.io.File(path)
        val deadline = System.currentTimeMillis() + 30000
        while (System.currentTimeMillis() < deadline &&
          !Option(root.listFiles()).exists(_.exists(
            _.getName.startsWith(".graft_dml_")))) Thread.sleep(1)
        var v = log.latestVersion + 1
        var done = false
        while (!done) {
          try {
            log.writeCommit(v, Seq(
              CommitInfo(System.currentTimeMillis(), "WRITE",
                operationParameters = Map("mode" -> "Append"),
                readVersion = Some(v - 1), isBlindAppend = Some(true)),
              AddFile("p=3/appended-d60.parquet", Map("p" -> "3"),
                size = appended.length(),
                modificationTime = appended.lastModified(), dataChange = true)))
            appendedAt.set(v); done = true
          } catch { // lost its own race → the append rebases too
            case _: java.util.ConcurrentModificationException =>
              v = log.latestVersion + 1
          }
        }
      })
      watcher.start()
      // partition-0 partial DELETE: rewrites files, so the staging dir
      // opens the race window the watcher keys on
      GraftDelta.deleteWhere(s, path,
        Seq(Seq(Predicate("p", "==", "0"), Predicate("c_custkey", "<=", k))))
      watcher.join()
      // BOTH landed: v1+v2 are the append and the DELETE in either order
      require(log.latestVersion == 2L,
        s"append and DELETE must both commit (head=${log.latestVersion})")
      require(appendedAt.get() > 0L, "the append must have committed")
      val ops = DeltaTableOps.history(s, path).select("operation")
        .as[String].collect().toSet
      require(ops.contains("DELETE") && ops.contains("WRITE"), ops.toString)
      GraftDelta.readDelta(s, path)
        .select($"c_custkey", $"c_name", $"bal_c", $"p")
        .orderBy($"c_custkey")
    }),

    // Write-path auto-maintenance (VERDICT r15 #3): a table carrying
    // delta.autoOptimize.optimizeWrite coalesces every write's staged
    // shape (a 16-task create lands ONE file), and autoCompact fires a
    // follow-up dataChange=false OPTIMIZE commit once a partition
    // accretes minNumFiles small files — the small-file counts and the
    // compaction commit are pinned in-query, the surviving content (the
    // whole nation table, written once across five slices) strictly
    // against the oracle.
    "d61_auto_optimize" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d61")
      val n = t(s, dir, "nation")
        .select($"n_nationkey", $"n_name", $"n_regionkey")
      val props = Map(
        "delta.autoOptimize.optimizeWrite" -> "true",
        "delta.autoOptimize.autoCompact" -> "true")
      val prevMin = s.conf.getOption("spark.graft.autoCompact.minNumFiles")
      s.conf.set("spark.graft.autoCompact.minNumFiles", "4")
      try {
        def nFiles: Int =
          DeltaLog.forTable(s, path).snapshot(None).activeFiles.size
        // CREATE from a deliberately 16-task plan: optimizeWrite must
        // coalesce the landed shape to ONE file
        GraftDelta.toDelta(n.filter($"n_nationkey" % 5 === 0).repartition(16),
          path, configuration = props)
        require(nFiles == 1, s"optimizeWrite create must land 1 file, got $nFiles")
        // four appends (slices 1-4, each an 8-task plan → 1 coalesced
        // file each); the DEBOUNCED hook (VERDICT r16 #6) re-qualifies
        // every ⌈minNumFiles/2⌉ = 2 commits, so the v2 boundary sees 3
        // files (below threshold) and the v4 boundary sees all 5 — one
        // compaction of everything down to ONE file, never a compaction
        // per commit
        (1 to 4).foreach { i =>
          GraftDelta.toDelta(n.filter($"n_nationkey" % 5 === i).repartition(8),
            path, mode = "append")
        }
        require(nFiles == 1,
          s"the v4 debounce boundary must compact all 5 small files to one, got $nFiles")
        // the compaction is an OPTIMIZE commit whose adds carry
        // dataChange=false (readers of the change feed see no rows)
        val hist = DeltaTableOps.history(s, path)
          .select($"version".cast("long"), $"operation")
          .collect().map(r => r.getLong(0) -> r.getString(1))
        val optVersions = hist.filter(_._2 == "OPTIMIZE").map(_._1)
        require(optVersions.length == 1, s"exactly one auto OPTIMIZE: ${hist.mkString(", ")}")
        val optJson = java.nio.file.Paths.get(path, "_delta_log",
          f"${optVersions.head}%020d.json")
        val addLines = scala.jdk.CollectionConverters.ListHasAsScala(
          java.nio.file.Files.readAllLines(optJson)).asScala
          .filter(_.contains("\"add\""))
        require(addLines.nonEmpty &&
          addLines.forall(_.contains("\"dataChange\":false")),
          "auto-compaction adds must carry dataChange=false")
        GraftDelta.readDelta(s, path)
          .select($"n_nationkey", $"n_name", $"n_regionkey")
          .withColumn("files_after_create", lit(1L))
          .withColumn("files_final", lit(nFiles.toLong))
          .withColumn("n_optimize_commits", lit(optVersions.length.toLong))
          .orderBy($"n_nationkey")
      } finally {
        prevMin match {
          case Some(v) => s.conf.set("spark.graft.autoCompact.minNumFiles", v)
          case None => s.conf.unset("spark.graft.autoCompact.minNumFiles")
        }
      }
    }),

    // Complex types END-TO-END through the engine's own paths: ArrayType,
    // MapType, DecimalType(38,6) + (18,2), and a struct-of-array column
    // go write → stats harvest (decimal JSON encoding is the known hard
    // spot: parquet stores UNSCALED ints, the stats value space wants
    // scaled decimals — the pre-r13 harvest recorded 123456 for 1234.56)
    // → partition pruning on a DECIMAL partition column → data skipping
    // on decimal stats (machine-checked in-query: an impossible decimal
    // range must prune EVERY file, for both int64- and binary-backed
    // precisions) → DELETE + UPDATE rewrites that round-trip the complex
    // columns → strict scalar-projected DuckDB readback.
    "d57_complex_types" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d57")
      val base = t(s, dir, "customer").select(
        $"c_custkey",
        $"c_acctbal".cast("decimal(38,6)").as("bal_d"),     // binary-backed
        $"c_acctbal".cast("decimal(18,2)").as("bal_s"),     // int64-backed
        ($"c_nationkey" % 5).cast("decimal(10,2)").as("np"), // partition col
        array($"c_custkey", $"c_nationkey").as("arr"),
        map(lit("bal"), cents($"c_acctbal")).as("mp"),
        struct(array($"c_mktsegment", $"c_name").as("tags"),
          $"c_nationkey".as("n")).as("nested"))
      GraftDelta.toDelta(base, path, partitionBy = Seq("np"))            // v0
      val log = DeltaLog.forTable(s, path)
      val snap0 = log.snapshot(None)
      val total = snap0.activeFiles.size
      // decimal partition pruning at the LOG level: np == 2.00 keeps a
      // strict, non-empty subset of files
      val p2 = graft.delta.DeltaRead.prunedFiles(snap0,
        Seq(Seq(Predicate("np", "==", BigDecimal("2.00"))))).size
      require(p2 > 0 && p2 < total, s"decimal partition pruning: $p2 of $total")
      // decimal DATA SKIPPING from the harvested stats: no acctbal
      // reaches 99999, so a correct scaled encode prunes every file;
      // the unscaled-encode bug (or missing binary-decimal stats) keeps
      // them all
      require(graft.delta.DeltaRead.prunedFiles(snap0,
        Seq(Seq(Predicate("bal_d", ">", BigDecimal("99999"))))).isEmpty,
        "binary-backed decimal stats must prune an impossible range")
      require(graft.delta.DeltaRead.prunedFiles(snap0,
        Seq(Seq(Predicate("bal_s", ">", BigDecimal("99999"))))).isEmpty,
        "int64-backed decimal stats must prune an impossible range")
      val mx = base.agg(max($"c_custkey")).as[Long].head()
      // DELETE low keys (file rewrite round-trips array/map/struct);
      // UPDATE high keys' decimal through the rewrite path too
      GraftDelta.deleteWhere(s, path,
        Seq(Seq(Predicate("c_custkey", "<=", mx / 10))))                 // v1
      GraftDelta.updateWhere(s, path,
        Seq(Seq(Predicate("c_custkey", ">", mx - mx / 10))),
        Map("bal_d" -> ($"bal_d" + 100)))                                // v2
      GraftDelta.readDelta(s, path)
        .select(
          $"c_custkey",
          ($"bal_d" * 100).cast("long").as("bal_c"),
          ($"bal_s" * 100).cast("long").as("bal_c2"),
          $"np".cast("long").as("np_l"),
          (element_at($"arr", 1) + element_at($"arr", 2)).as("arr_sum"),
          element_at($"mp", "bal").as("map_bal"),
          element_at($"nested.tags", 1).as("tag0"),
          $"nested.n".as("nested_n"))
        .orderBy($"c_custkey")
    }),

    // MERGE WITH SCHEMA EVOLUTION: the source brings a column the target
    // lacks (bal_c) — the merge appends it to the target schema in the
    // SAME commit as the data swap. Matched rows take the source values,
    // untouched rows read null for the evolved column (no rewrite of
    // cold files — pinned: only the matched file set swaps), inserts
    // carry it. Oracle rebuilds all three populations from the source.
    "d54_merge_evolution" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d54")
      val sup = t(s, dir, "supplier")
      GraftDelta.toDelta(
        sup.select($"s_suppkey", $"s_name", $"s_nationkey")
          .repartitionByRange(4, $"s_suppkey"), path)                    // v0
      // matched keys confined to the LOW half of the key range, so the
      // range-clustered upper files provably contain no match and must
      // survive the evolving merge by identity (evolution is metadata,
      // not a table rewrite)
      val half = sup.agg(max($"s_suppkey")).as[Long].head() / 2
      val src = sup.filter($"s_suppkey" % 3 === 0 && $"s_suppkey" <= half)
        .select($"s_suppkey", concat($"s_name", lit("*")).as("s_name"),
          $"s_nationkey", cents($"s_acctbal").as("bal_c"))
      val source = src.unionByName(
        src.select(($"s_suppkey" + 1000000L).as("s_suppkey"),
          $"s_name", $"s_nationkey", $"bal_c"))
      val pre = DeltaLog.forTable(s, path).snapshot(None)
      require(!pre.schema.fieldNames.contains("bal_c"))
      val r = graft.delta.DeltaDml.mergeClauses(s, path, source, Seq("s_suppkey"),
        matched = Seq(graft.delta.DeltaDml.MatchedClause(
          graft.delta.DeltaDml.WhenMatched.UpdateAll)),
        schemaEvolution = true)                                          // v1
      val post = DeltaLog.forTable(s, path).snapshot(None)
      require(post.schema.fieldNames.toSeq ==
        Seq("s_suppkey", "s_name", "s_nationkey", "bal_c"),
        s"evolved schema: ${post.schema.fieldNames.mkString(",")}")
      val postPaths = post.activeFiles.map(_.path).toSet
      require(pre.activeFiles.exists(f => postPaths.contains(f.path)),
        "out-of-range cold files must survive the evolving merge untouched")
      GraftDelta.readDelta(s, path)
        .withColumn("n_matched", lit(r.matchedRows))
        .orderBy($"s_suppkey")
    }),

    // COLUMN DEFAULTS (writer feature allowColumnDefaults): ADD COLUMN →
    // SET DEFAULT → INSERT with a column list omitting the defaulted
    // column; pre-existing rows keep null (defaults never rewrite
    // history), inserted rows fill the declared constant. The oracle
    // rebuilds both populations from the raw source.
    "d47_column_default" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d47")
      val src = tmp("d47src")
      GraftDelta.toDelta(
        t(s, dir, "nation").select($"n_nationkey", $"n_name"), path)     // v0
      GraftDelta.toDelta(
        t(s, dir, "nation")
          .select(($"n_nationkey" + 100L).as("n_nationkey"), $"n_name"), src)
      graft.sql.GraftSql.sql(s,
        s"ALTER TABLE delta.`$path` ADD COLUMN status STRING")           // v1
      graft.sql.GraftSql.sql(s,
        s"ALTER TABLE delta.`$path` ALTER COLUMN status SET DEFAULT 'NEW'") // v2
      graft.sql.GraftSql.sql(s,
        s"INSERT INTO delta.`$path` (n_nationkey, n_name) " +
          s"SELECT n_nationkey, n_name FROM delta.`$src`")               // v3
      val snap = DeltaLog.forTable(s, path).snapshot(None)
      require(snap.protocol.writerFeatures.exists(_.contains("allowColumnDefaults")),
        s"defaults table must declare the feature: ${snap.protocol}")
      GraftDelta.readDelta(s, path).orderBy($"n_nationkey")
    }),

    // VARIANT (reader+writer feature variantType): semi-structured
    // payloads stored as Spark 4's native VariantType — the create
    // stamps the feature, predicate DML rewrites files carrying the
    // variant column, and the readback extracts typed fields with
    // variant_get (real decode, not opaque bytes). The oracle rebuilds
    // the extracted values from the raw source columns.
    "d46_variant" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d46")
      val src = t(s, dir, "orders").filter($"o_orderkey" % 5 === 0)
        .select($"o_orderkey",
          parse_json(to_json(struct($"o_custkey".as("cust"),
            $"o_orderstatus".as("status"),
            cents($"o_totalprice").as("price_c")))).as("v"))
      GraftDelta.toDelta(src, path)                                     // v0
      GraftDelta.deleteWhere(s, path,
        Seq(Seq(Predicate("o_orderkey", "<", 1000L))))                  // v1
      val snap = DeltaLog.forTable(s, path).snapshot(None)
      require(snap.protocol.readerFeatures.exists(_.contains("variantType")),
        s"variant table must declare the feature: ${snap.protocol}")
      require(snap.schema("v").dataType ==
        org.apache.spark.sql.types.VariantType,
        s"schema must keep variant: ${snap.schema("v").dataType}")
      GraftDelta.readDelta(s, path)
        .select($"o_orderkey",
          variant_get($"v", "$.cust", "long").as("cust"),
          variant_get($"v", "$.status", "string").as("status"),
          variant_get($"v", "$.price_c", "long").as("price_c"))
        .orderBy($"o_orderkey")
    }),

    // LIQUID CLUSTERING: CLUSTER BY stores the layout columns; a bare
    // OPTIMIZE Z-orders by them (no re-naming the layout per run). The
    // in-query requires pin the domain + the recorded layout; the oracle
    // checks the clustered rewrite changed no row.
    "d44_clustering" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d44")
      GraftDelta.toDelta(t(s, dir, "supplier").repartition(8), path)
      graft.sql.GraftSql.sql(s,
        s"ALTER TABLE delta.`$path` CLUSTER BY (s_suppkey, s_nationkey)")
      graft.sql.GraftSql.sql(s, s"OPTIMIZE delta.`$path`")
      val log = DeltaLog.forTable(s, path)
      require(DeltaTableOps.clusteringColumnsOf(log.snapshot(None)) ==
        Seq("s_suppkey", "s_nationkey"), "clustering domain must survive OPTIMIZE")
      val params = log.readCommitActions(log.latestVersion).collectFirst {
        case ci: CommitInfo => ci.operationParameters
      }.getOrElse(Map.empty[String, String])
      require(params.get("zorder").contains("true"),
        s"bare OPTIMIZE must Z-order by the stored columns: $params")
      GraftDelta.readDelta(s, path)
        .select($"s_suppkey", $"s_nationkey", $"s_name",
          cents($"s_acctbal").as("acctbal_c"))
        .orderBy($"s_suppkey")
    }),

    // SYMLINK MANIFESTS (GENERATE): the round-trip oracle — the union of
    // the per-partition manifest files' URI lines, read back as plain
    // parquet, must be exactly the table. Regeneration/DV-refusal
    // semantics are pinned in GraftTableSpec.
    "d43_symlink_manifest" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d43")
      GraftDelta.toDelta(t(s, dir, "region"), path, partitionBy = Seq("r_regionkey"))
      graft.sql.GraftSql.sql(s,
        s"GENERATE symlink_format_manifest FOR TABLE delta.`$path`")
      val root = new org.apache.hadoop.fs.Path(path, "_symlink_format_manifest")
      val fs = root.getFileSystem(s.sessionState.newHadoopConf())
      val it = fs.listFiles(root, true)
      val listed = Seq.newBuilder[String]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName == "manifest") {
          val in = fs.open(f.getPath)
          try listed ++= scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          finally in.close()
        }
      }
      // manifests name data files only; partition values come from the
      // hive dirs the manifest paths run through (basePath recovery)
      s.read.option("basePath", path).parquet(listed.result(): _*)
        .select($"r_regionkey".cast("long").as("r_regionkey"), $"r_name")
        .orderBy($"r_regionkey")
    }),

    // IN-COMMIT TIMESTAMPS (delta.enableInCommitTimestamps, writer-7
    // feature): three commits on an ICT table; every commitInfo must be
    // stamped, strictly monotonically, and travel-by-the-middle-ICT must
    // resolve version 1 — pinned as integers (wall-clock values are not
    // oracle-able, their ORDERING and AUTHORITY are).
    "d33_ict" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d33")
      val n = t(s, dir, "nation").select($"n_nationkey", $"n_name")
      GraftDelta.toDelta(n.filter($"n_nationkey" < 10), path,
        configuration = Map("delta.enableInCommitTimestamps" -> "true"))  // v0
      GraftDelta.toDelta(
        n.filter($"n_nationkey" >= 10 && $"n_nationkey" < 20), path,
        mode = "append")                                                  // v1
      GraftDelta.toDelta(n.filter($"n_nationkey" >= 20), path,
        mode = "append")                                                  // v2
      val log = graft.delta.DeltaLog.forTable(s, path)
      val icts = (0L to 2L).flatMap(v =>
        log.commitInfoOf(v).flatMap(_.inCommitTimestamp))
      val stamped = icts.length.toLong
      val monotonic = if (icts == icts.sorted && icts.distinct == icts) 1L else 0L
      // travel to the middle commit BY ITS ICT
      val atV1 = GraftDelta.readDelta(s, path,
        timestamp = Some(
          java.time.Instant.ofEpochMilli(icts(1)).toString)).count()
      GraftDelta.readDelta(s, path)
        .agg(count(lit(1)).as("n_total"))
        .withColumn("n_stamped", lit(stamped))
        .withColumn("monotonic_ok", lit(monotonic))
        .withColumn("n_at_v1", lit(atV1))
    }),

    // ⑭ write modes: error-create, append×2, ignore no-op → 3× the rows.
    "d12_write_modes" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d12")
      val r = t(s, dir, "region")
      GraftDelta.toDelta(r, path) // mode=error creates
      GraftDelta.toDelta(r, path, mode = "append")
      GraftDelta.toDelta(r, path, mode = "append")
      GraftDelta.toDelta(r.filter(lit(false)), path, mode = "ignore") // no-op
      val gotError =
        try { GraftDelta.toDelta(r, path); false }
        catch { case _: IllegalStateException => true }
      require(gotError, "mode=error must refuse an existing table")
      GraftDelta.readDelta(s, path).orderBy($"r_regionkey", $"r_name")
    }),

    // SHALLOW CLONE: metadata-only fork — clone commit 0 re-adds the
    // source's files by absolute path; an append to the clone must not
    // touch the source (its row count rides along as src_rows).
    "d19_clone" -> ((s, dir) => {
      import s.implicits._
      val src = tmp("d19src")
      val cln = tmp("d19cln")
      val c = t(s, dir, "customer")
      GraftDelta.toDelta(c, src)                                     // source v0
      GraftDelta.shallowClone(s, src, cln)                           // clone v0
      GraftDelta.toDelta(
        c.filter($"c_custkey" <= 100).withColumn("c_custkey", $"c_custkey" + 1000000L),
        cln, mode = "append")                                        // clone v1
      val srcRows = GraftDelta.readDelta(s, src).count()             // untouched
      GraftDelta.readDelta(s, cln)
        .select($"c_custkey", $"c_name", cents($"c_acctbal").as("acctbal_c"))
        .withColumn("src_rows", lit(srcRows))
        .orderBy($"c_custkey")
    }),

    // CHECK constraints (writer protocol v3): add validates the table,
    // conforming appends pass, a violating append must fail BEFORE any
    // commit — the readback proves no partial state leaked.
    "d20_constraints" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d20")
      val sup = t(s, dir, "supplier")
      GraftDelta.toDelta(sup.filter($"s_suppkey" % 2 === 0), path)         // v0
      GraftDelta.addCheckConstraint(s, path, "bal_floor", "s_acctbal >= -1000.0") // v1
      GraftDelta.toDelta(sup.filter($"s_suppkey" % 2 === 1), path, mode = "append") // v2
      val rejected =
        try {
          GraftDelta.toDelta(
            sup.limit(3).withColumn("s_acctbal", lit(-999999.0)),
            path, mode = "append")
          0L
        } catch { case _: Exception => 1L }
      require(rejected == 1L, "violating append must be rejected")
      GraftDelta.readDelta(s, path)
        .select($"s_suppkey", $"s_nationkey", cents($"s_acctbal").as("acctbal_c"))
        .withColumn("n_rejected_writes", lit(rejected))
        .orderBy($"s_suppkey")
    }),

    // replaceWhere: predicate-scoped overwrite — one region's partition
    // is replaced (values shifted +1000), the others untouched; a row
    // outside the predicate must fail the write before any commit.
    "d21_replace_where" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d21")
      val n = t(s, dir, "nation")
      GraftDelta.toDelta(n, path, partitionBy = Seq("n_regionkey"))       // v0
      GraftDelta.toDelta(
        n.filter($"n_regionkey" === 2)
          .withColumn("n_nationkey", ($"n_nationkey" + 1000).cast("int")),
        path, mode = "overwrite",
        replaceWhere = Seq(Seq(graft.delta.Predicate("n_regionkey", "==", 2L)))) // v1
      val rejected =
        try {
          GraftDelta.toDelta(n.filter($"n_regionkey" === 0), path, mode = "overwrite",
            replaceWhere = Seq(Seq(graft.delta.Predicate("n_regionkey", "==", 3L))))
          0L
        } catch { case _: Exception => 1L }
      require(rejected == 1L, "out-of-predicate rows must be rejected")
      GraftDelta.readDelta(s, path)
        .select($"n_nationkey".cast("long").as("n_nationkey"), $"n_name",
          $"n_regionkey".cast("long").as("n_regionkey"))
        .withColumn("n_rejected_writes", lit(rejected))
        .orderBy($"n_nationkey")
    }),

    // CONVERT TO DELTA: a plain hive-partitioned parquet directory
    // becomes a Delta table in place; the readback (incl. partition
    // pruning through harvested metadata) must equal the source.
    "d22_convert" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d22")
      t(s, dir, "orders")
        .withColumn("bucket", concat(lit("b"), ($"o_orderkey" % 4).cast("string")))
        .write.partitionBy("bucket").parquet(path)
      val res = GraftDelta.convertToDelta(s, path)
      require(res.partitionColumns == Seq("bucket"), s"partition detect: $res")
      GraftDelta.readDelta(s, path,
          filters = Seq(Seq(graft.delta.Predicate("bucket", "!=", "b3"))))
        .select($"o_orderkey", $"o_orderstatus", cents($"o_totalprice").as("total_c"),
          $"bucket")
        .orderBy($"o_orderkey")
    }),

    // Metadata-only aggregate: COUNT/MIN/MAX/null-counts answered from
    // the log's per-file stats with zero data files opened (require pins
    // the strategy — a stats regression would fail the harness, not
    // silently fall back to a scan). o_disc plants deterministic NULLs so
    // the null-count and null-aware MIN/MAX paths are exercised.
    "d23_stats_agg" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d23")
      GraftDelta.toDelta(
        t(s, dir, "orders")
          .withColumn("o_disc",
            when($"o_orderkey" % 7 === 0, lit(null).cast("double"))
              .otherwise($"o_totalprice"))
          .repartition(8),
        path)
      val r = DeltaTableOps.statsAggregate(
        s, path, Seq("o_orderkey", "o_totalprice", "o_disc"))
      require(r.metadataOnly, "stats-complete table must answer from metadata alone")
      r.df.select($"n_rows",
        $"min_o_orderkey", $"max_o_orderkey", $"nulls_o_orderkey",
        cents($"min_o_totalprice").as("min_total_c"),
        cents($"max_o_totalprice").as("max_total_c"), $"nulls_o_totalprice",
        cents($"min_o_disc").as("min_disc_c"),
        cents($"max_o_disc").as("max_disc_c"), $"nulls_o_disc")
    }),

    // Per-partition COUNT(*) from the log alone (typed through the table
    // schema — `bucket` comes back as INT, not the log's string form);
    // the require pins the metadata-only strategy.
    "d24_partition_counts" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d24")
      GraftDelta.toDelta(
        t(s, dir, "orders")
          .withColumn("bucket", ($"o_orderkey" % 4).cast("int")),
        path, partitionBy = Seq("o_orderstatus", "bucket"))
      val r = DeltaTableOps.partitionCounts(s, path)
      require(r.metadataOnly, "stats-complete table must count from metadata alone")
      r.df.select($"o_orderstatus", $"bucket", $"n_rows")
        .orderBy($"o_orderstatus", $"bucket")
    }),

    // Hybrid predicate count: range-clustered files let stats PROVE full
    // inclusion, so only boundary files are scanned; the requires pin
    // that the metadata actually carried weight and the scan stayed
    // partial. The count itself is oracle-exact regardless of layout.
    "d25_count_where" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d25")
      GraftDelta.toDelta(
        t(s, dir, "orders").repartitionByRange(8, $"o_totalprice"), path)
      val r = DeltaTableOps.countWhere(s, path,
        Seq(Seq(graft.delta.Predicate("o_totalprice", ">", 150000.0))))
      require(r.filesFromStats > 0,
        s"range-clustered files must prove inclusion from stats: $r")
      require(r.filesScanned < r.filesTotal, s"only boundary files may scan: $r")
      Seq(r.count).toDF("n_match")
    }),

    // Deletion-vector DELETE: soft-delete bitmaps instead of file
    // rewrites (reader 3 / writer 7 table feature); the require pins
    // zero rewrites, and the strict readback proves the scan applies the
    // bitmaps exactly.
    "d26_dv_delete" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d26")
      GraftDelta.toDelta(
        t(s, dir, "customer").repartitionByRange(4, $"c_custkey"), path)
      val r = GraftDelta.deleteWhereWithDv(s, path,
        Seq(Seq(graft.delta.Predicate("c_acctbal", "<", 0.0))))
      require(r.rewrittenFiles == 0, s"DV delete must not rewrite data files: $r")
      require(r.addedFiles + r.removedFiles > 0, s"delete must touch files: $r")
      GraftDelta.readDelta(s, path)
        .select($"c_custkey", $"c_name", cents($"c_acctbal").as("acctbal_c"))
        .withColumn("n_deleted", lit(r.affectedRows))
        .orderBy($"c_custkey")
    }),

    // Deletion-vector UPDATE: matched rows DV'd out, updated versions
    // appended — write cost O(matched rows), zero file rewrites (pinned).
    "d27_dv_update" -> ((s, dir) => {
      import s.implicits._
      val path = tmp("d27")
      GraftDelta.toDelta(
        t(s, dir, "supplier").repartitionByRange(4, $"s_nationkey"), path)
      val r = GraftDelta.updateWhereWithDv(s, path,
        Seq(Seq(Predicate("s_nationkey", "<", 5))),
        Map("s_acctbal" -> ($"s_acctbal" + 100.0)))
      require(r.rewrittenFiles == 0, s"DV update must not rewrite files: $r")
      GraftDelta.readDelta(s, path)
        .select($"s_suppkey", $"s_nationkey", cents($"s_acctbal").as("acctbal_c"))
        .withColumn("n_updated", lit(r.affectedRows))
        .orderBy($"s_suppkey")
    })
  )

  val oracles: Map[String, String] = Map(
    "d61_auto_optimize" ->
      """SELECT n_nationkey, n_name, n_regionkey,
        | CAST(1 AS BIGINT) AS files_after_create,
        | CAST(1 AS BIGINT) AS files_final,
        | CAST(1 AS BIGINT) AS n_optimize_commits
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "d60_concurrent_rebase" ->
      """WITH m AS (SELECT CAST(MAX(c_custkey) AS BIGINT) // 2 AS k FROM customer)
        |SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
        |       CAST(ROUND(c_acctbal*100) AS BIGINT) AS bal_c,
        |       CAST(c_custkey % 4 AS VARCHAR) AS p
        |FROM customer, m
        |WHERE NOT (c_custkey % 4 = 0 AND c_custkey <= m.k)
        |UNION ALL
        |SELECT CAST(c_custkey + 1000000 AS BIGINT), c_name,
        |       CAST(ROUND(c_acctbal*100) AS BIGINT), '3'
        |FROM customer WHERE c_custkey % 4 = 3
        |ORDER BY c_custkey""".stripMargin,
    "d01_roundtrip" ->
      """SELECT s_suppkey, s_name, s_nationkey,
        | CAST(ROUND(s_acctbal*100) AS BIGINT) AS acctbal_c
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "d02_travel_version" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        | CAST(ROUND(o_totalprice*100) AS BIGINT) AS total_c
        |FROM orders WHERE o_orderkey < 5000 ORDER BY o_orderkey""".stripMargin,
    "d03_travel_timestamp" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        | CAST(ROUND(o_totalprice*100) AS BIGINT) AS total_c
        |FROM orders WHERE o_orderkey < 5000 ORDER BY o_orderkey""".stripMargin,
    "d04_checkpoint" ->
      """SELECT s_suppkey, s_name, CAST(ROUND(s_acctbal*100) AS BIGINT) AS acctbal_c
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "d35_v2_checkpoint" ->
      """SELECT s_suppkey, s_name, CAST(ROUND(s_acctbal*100) AS BIGINT) AS acctbal_c
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "d38_type_widening" ->
      """SELECT s_suppkey, s_name, CAST(ROUND(s_acctbal*100) AS BIGINT) AS acctbal_c
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "d39_add_column" ->
      """SELECT n_nationkey, n_name, CAST(NULL AS VARCHAR) AS note, n_regionkey
        |FROM nation
        |UNION ALL SELECT 901, 'NEWLAND', 'added', 0
        |UNION ALL SELECT 902, 'OLDLAND', 'added', 1
        |ORDER BY n_nationkey""".stripMargin,
    "d41_sql_time_fn" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, COUNT(*) AS n,
        | CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_c,
        | (SELECT COUNT(*) FROM orders
        |  WHERE o_orderdate = DATE '1996-03-15') AS n_mar15_1996
        |FROM orders WHERE year(o_orderdate) <> 1995
        |GROUP BY yr ORDER BY yr""".stripMargin,
    "d40_catalog_table" ->
      """SELECT c_custkey, c_nationkey,
        | CASE WHEN c_nationkey = 5 THEN 'CAT' ELSE c_mktsegment END AS c_mktsegment,
        | CAST(ROUND(c_acctbal*100) AS BIGINT) AS acctbal_c
        |FROM customer WHERE c_acctbal >= 0 ORDER BY c_custkey""".stripMargin,
    "d45_widen_column" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name FROM nation
        |UNION ALL SELECT CAST(n_nationkey + 1000 AS BIGINT), n_name FROM nation
        |ORDER BY n_nationkey""".stripMargin,
    "d48_deep_clone" ->
      """SELECT s_suppkey, s_nationkey, s_name,
        | CAST(ROUND(s_acctbal*100) AS BIGINT) AS acctbal_c
        |FROM supplier WHERE s_nationkey <> 0
        |ORDER BY s_suppkey""".stripMargin,
    "d47_column_default" ->
      """SELECT CAST(n_nationkey AS INTEGER) AS n_nationkey, n_name,
        | CAST(NULL AS VARCHAR) AS status FROM nation
        |UNION ALL
        |SELECT CAST(n_nationkey + 100 AS INTEGER), n_name, 'NEW' FROM nation
        |ORDER BY n_nationkey""".stripMargin,
    "d46_variant" ->
      """SELECT o_orderkey, o_custkey AS cust, o_orderstatus AS status,
        | CAST(ROUND(o_totalprice*100) AS BIGINT) AS price_c
        |FROM orders WHERE o_orderkey % 5 = 0 AND o_orderkey >= 1000
        |ORDER BY o_orderkey""".stripMargin,
    "d44_clustering" ->
      """SELECT s_suppkey, s_nationkey, s_name,
        | CAST(ROUND(s_acctbal*100) AS BIGINT) AS acctbal_c
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "d43_symlink_manifest" ->
      """SELECT CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name
        |FROM region ORDER BY r_regionkey""".stripMargin,
    "d42_tblproperties" ->
      """SELECT key, value
        |FROM (VALUES ('team', 'data'), ('tier', 'gold')) AS t(key, value)
        |ORDER BY key""".stripMargin,
    "d37_ntz" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate,
        | CAST(ROUND(l_quantity*100) AS BIGINT) AS qty_c
        |FROM lineitem
        |WHERE l_orderkey % 7 = 0 AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "d36_sql_dml" ->
      """SELECT c_custkey, c_nationkey,
        | CASE WHEN c_nationkey IN (3, 7) THEN 'SQLSEG' ELSE c_mktsegment END AS c_mktsegment,
        | CAST(ROUND(c_acctbal*100) AS BIGINT) AS acctbal_c
        |FROM customer WHERE c_acctbal >= 0 ORDER BY c_custkey""".stripMargin,
    "d05_projection" ->
      "SELECT p_partkey, p_brand FROM part ORDER BY p_partkey",
    "d06_predicate" ->
      """SELECT c_custkey, c_name, c_nationkey,
        | CAST(ROUND(c_acctbal*100) AS BIGINT) AS acctbal_c
        |FROM customer WHERE c_acctbal > 5000 AND c_nationkey <= 10
        |ORDER BY c_custkey""".stripMargin,
    "d07_partition_prune" ->
      """SELECT o_orderkey, o_orderstatus, CAST(ROUND(o_totalprice*100) AS BIGINT) AS total_c
        |FROM orders WHERE o_orderstatus IN ('O','F') ORDER BY o_orderkey""".stripMargin,
    "d08_schema_evolution" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "d09_empty" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE 1=0 ORDER BY n_nationkey",
    "d10_history" ->
      """SELECT * FROM (VALUES
        | (CAST(2 AS BIGINT), 'WRITE', 'Append', '1'),
        | (CAST(1 AS BIGINT), 'WRITE', 'Append', '1'),
        | (CAST(0 AS BIGINT), 'CREATE TABLE AS SELECT', 'ErrorIfExists', '1')
        |) t(version, operation, mode, num_files) ORDER BY version DESC""".stripMargin,
    "d11_vacuum" ->
      "SELECT CAST(2 AS BIGINT) AS tombstones, CAST(3 AS BIGINT) AS files_after",
    "d13_compaction" ->
      """SELECT s_suppkey, CAST(2 AS BIGINT) AS n,
        | CAST(2 * ROUND(s_acctbal*100) AS BIGINT) AS bal_c,
        | CAST(8 AS BIGINT) AS files_before, CAST(1 AS BIGINT) AS files_after
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "d17_restore" ->
      """SELECT c_custkey, c_name, c_nationkey,
        | CAST(ROUND(c_acctbal*100) AS BIGINT) AS acctbal_c,
        | CAST(3 AS BIGINT) AS restore_version
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "d19_clone" ->
      """SELECT * FROM (
        | SELECT c_custkey, c_name, CAST(ROUND(c_acctbal*100) AS BIGINT) AS acctbal_c,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS src_rows FROM customer
        | UNION ALL
        | SELECT c_custkey + 1000000, c_name, CAST(ROUND(c_acctbal*100) AS BIGINT),
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM customer)
        | FROM customer WHERE c_custkey <= 100
        |) ORDER BY c_custkey""".stripMargin,
    "d20_constraints" ->
      """SELECT s_suppkey, s_nationkey,
        | CAST(ROUND(s_acctbal*100) AS BIGINT) AS acctbal_c,
        | CAST(1 AS BIGINT) AS n_rejected_writes
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "d21_replace_where" ->
      """SELECT * FROM (
        | SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        |  CAST(n_regionkey AS BIGINT) AS n_regionkey,
        |  CAST(1 AS BIGINT) AS n_rejected_writes
        | FROM nation WHERE n_regionkey <> 2
        | UNION ALL
        | SELECT CAST(n_nationkey + 1000 AS BIGINT), n_name, CAST(n_regionkey AS BIGINT),
        |  CAST(1 AS BIGINT)
        | FROM nation WHERE n_regionkey = 2
        |) ORDER BY n_nationkey""".stripMargin,
    "d22_convert" ->
      """SELECT o_orderkey, o_orderstatus,
        | CAST(ROUND(o_totalprice*100) AS BIGINT) AS total_c,
        | 'b' || CAST(o_orderkey % 4 AS VARCHAR) AS bucket
        |FROM orders WHERE o_orderkey % 4 <> 3
        |ORDER BY o_orderkey""".stripMargin,
    "d23_stats_agg" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        | MIN(o_orderkey) AS min_o_orderkey, MAX(o_orderkey) AS max_o_orderkey,
        | CAST(0 AS BIGINT) AS nulls_o_orderkey,
        | CAST(ROUND(MIN(o_totalprice)*100) AS BIGINT) AS min_total_c,
        | CAST(ROUND(MAX(o_totalprice)*100) AS BIGINT) AS max_total_c,
        | CAST(0 AS BIGINT) AS nulls_o_totalprice,
        | CAST(ROUND(MIN(CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_totalprice END)*100) AS BIGINT) AS min_disc_c,
        | CAST(ROUND(MAX(CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_totalprice END)*100) AS BIGINT) AS max_disc_c,
        | CAST(SUM(CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nulls_o_disc
        |FROM orders""".stripMargin,
    "d24_partition_counts" ->
      """SELECT o_orderstatus, CAST(o_orderkey % 4 AS INTEGER) AS bucket,
        | CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM orders GROUP BY 1, 2 ORDER BY o_orderstatus, bucket""".stripMargin,
    "d25_count_where" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_match
        |FROM orders WHERE o_totalprice > 150000.0""".stripMargin,
    "d26_dv_delete" ->
      """SELECT c_custkey, c_name,
        | CAST(ROUND(c_acctbal*100) AS BIGINT) AS acctbal_c,
        | (SELECT CAST(COUNT(*) AS BIGINT) FROM customer WHERE c_acctbal < 0) AS n_deleted
        |FROM customer WHERE NOT (c_acctbal < 0) ORDER BY c_custkey""".stripMargin,
    "d27_dv_update" ->
      """SELECT s_suppkey, s_nationkey,
        | CAST(ROUND((CASE WHEN s_nationkey < 5 THEN s_acctbal + 100 ELSE s_acctbal END)*100) AS BIGINT) AS acctbal_c,
        | (SELECT CAST(COUNT(*) AS BIGINT) FROM supplier WHERE s_nationkey < 5) AS n_updated
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "d18_table_changes" ->
      """SELECT o_orderkey, o_orderstatus,
        | CAST(ROUND(o_totalprice*100) AS BIGINT) AS total_c,
        | 'insert' AS _change_type,
        | CAST(CASE WHEN o_orderkey < 6000 THEN 1 ELSE 2 END AS BIGINT) AS _commit_version
        |FROM orders WHERE o_orderkey >= 3000 ORDER BY o_orderkey""".stripMargin,
    "d51_mapped_cdf" ->
      """WITH chg AS (
        |  SELECT s_suppkey, s_nationkey,
        |    CAST(ROUND(s_acctbal*100) AS BIGINT) AS bal_c,
        |    'delete' AS _change_type, CAST(3 AS BIGINT) AS _commit_version
        |  FROM supplier WHERE s_acctbal < 0
        |  UNION ALL
        |  SELECT s_suppkey, s_nationkey,
        |    CAST(ROUND(s_acctbal*100) AS BIGINT),
        |    'update_preimage', CAST(4 AS BIGINT)
        |  FROM supplier WHERE s_nationkey < 5 AND s_acctbal >= 0
        |  UNION ALL
        |  SELECT s_suppkey, s_nationkey,
        |    CAST(ROUND((s_acctbal+100)*100) AS BIGINT),
        |    'update_postimage', CAST(4 AS BIGINT)
        |  FROM supplier WHERE s_nationkey < 5 AND s_acctbal >= 0)
        |SELECT * FROM chg
        |ORDER BY _commit_version, _change_type, s_suppkey""".stripMargin,
    "d50_merge_clauses" ->
      """SELECT c_custkey AS key, c_nationkey,
        | CAST(ROUND((CASE
        |   WHEN c_custkey % 3 = 0 AND c_nationkey < 10 THEN c_acctbal + 1000
        |   WHEN c_custkey % 3 = 0 THEN c_acctbal + 5
        |   ELSE c_acctbal END)*100) AS BIGINT) AS bal_c,
        | CASE WHEN c_custkey % 3 <> 0 THEN 'AGED' ELSE c_mktsegment END AS seg
        |FROM customer
        |WHERE NOT (c_custkey % 3 = 0 AND c_acctbal < 0)
        |  AND NOT (c_custkey % 3 <> 0 AND c_nationkey >= 20)
        |ORDER BY key""".stripMargin,
    "d49_mapped_dml" ->
      """SELECT c_custkey AS key, c_nationkey,
        | CAST(ROUND((CASE WHEN c_nationkey < 5 THEN c_acctbal + 100
        |   ELSE c_acctbal END)*100) AS BIGINT) AS bal_c
        |FROM customer WHERE c_acctbal >= 0
        |ORDER BY key""".stripMargin,
    "d52_rt_mapping" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        | CAST(count(*) AS BIGINT) AS n_distinct_ids,
        | CAST(0 AS BIGINT) AS n_rehomed,
        | CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS BIGINT) AS total_c
        |FROM customer WHERE NOT (c_acctbal < 0)""".stripMargin,
    "d53_reorg_purge" ->
      """SELECT c_custkey, c_name,
        | CAST(ROUND(c_acctbal*100) AS BIGINT) AS acctbal_c,
        | (SELECT CAST(COUNT(*) AS BIGINT) FROM customer WHERE c_acctbal < 0) AS n_deleted
        |FROM customer WHERE NOT (c_acctbal < 0) ORDER BY c_custkey""".stripMargin,
    "d55_drop_feature" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        | CAST(ROUND(o_totalprice*100) AS BIGINT) AS total_c
        |FROM orders WHERE NOT (o_totalprice < 50000)
        |ORDER BY o_orderkey""".stripMargin,
    "d58_drop_features" ->
      """SELECT s_suppkey, s_nationkey,
        | CAST(CASE WHEN s_suppkey <= 5 THEN 1 ELSE 0 END AS BIGINT) AS upd
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "d59_drop_format_features" ->
      """SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
        |       CAST(ROUND(s_acctbal*100) AS BIGINT) AS bal_c FROM supplier
        |UNION ALL
        |SELECT CAST(s_suppkey + 10000 AS BIGINT), s_name,
        |       CAST(ROUND(s_acctbal*100) AS BIGINT) FROM supplier
        |ORDER BY s_suppkey""".stripMargin,
    "d57_complex_types" ->
      """WITH m AS (SELECT CAST(MAX(c_custkey) AS BIGINT) AS mx FROM customer)
        |SELECT c_custkey,
        | CAST(ROUND(c_acctbal*100) AS BIGINT) +
        |   CASE WHEN c_custkey > mx - mx // 10 THEN 10000 ELSE 0 END AS bal_c,
        | CAST(ROUND(c_acctbal*100) AS BIGINT) AS bal_c2,
        | CAST(c_nationkey % 5 AS BIGINT) AS np_l,
        | CAST(c_custkey + c_nationkey AS BIGINT) AS arr_sum,
        | CAST(ROUND(c_acctbal*100) AS BIGINT) AS map_bal,
        | c_mktsegment AS tag0,
        | c_nationkey AS nested_n
        |FROM customer, m WHERE c_custkey > mx // 10
        |ORDER BY c_custkey""".stripMargin,
    "d56_vacuum_orphans" ->
      """SELECT c_custkey, c_name, c_nationkey,
        | CAST(ROUND(c_acctbal*100) AS BIGINT) AS bal_c,
        | CAST(2 AS BIGINT) AS orphans_removed
        |FROM customer WHERE NOT (c_acctbal < 0)
        |ORDER BY c_custkey""".stripMargin,
    "d54_merge_evolution" ->
      """WITH m AS (SELECT CAST(MAX(s_suppkey) AS BIGINT) // 2 AS half FROM supplier),
        |src AS (SELECT s_suppkey, s_name || '*' AS s_name, s_nationkey,
        |          CAST(ROUND(s_acctbal*100) AS BIGINT) AS bal_c
        |        FROM supplier, m WHERE s_suppkey % 3 = 0 AND s_suppkey <= m.half)
        |SELECT s_suppkey, s_name, s_nationkey, bal_c, n_matched FROM (
        |  SELECT t.s_suppkey, COALESCE(u.s_name, t.s_name) AS s_name,
        |         t.s_nationkey, u.bal_c AS bal_c
        |  FROM supplier t LEFT JOIN src u USING (s_suppkey)
        |  UNION ALL
        |  SELECT s_suppkey + 1000000, s_name, s_nationkey, bal_c FROM src
        |) CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS n_matched FROM src)
        |ORDER BY s_suppkey""".stripMargin,
    "d29_column_rename" ->
      """SELECT key, bal_c, mode FROM (
        | SELECT c_custkey AS key,
        |  CAST(ROUND(c_acctbal*100) AS BIGINT) AS bal_c, 'name' AS mode
        | FROM customer
        | UNION ALL
        | SELECT c_custkey + 1000000,
        |  CAST(ROUND((c_acctbal+50)*100) AS BIGINT), 'name'
        | FROM customer WHERE c_custkey <= 100
        | UNION ALL
        | SELECT c_custkey, CAST(ROUND(c_acctbal*100) AS BIGINT), 'id'
        | FROM customer)
        |ORDER BY mode, key""".stripMargin,
    "d28_dv_changes" ->
      """WITH chg AS (
        |  SELECT c_custkey, c_nationkey,
        |    CAST(ROUND(c_acctbal*100) AS BIGINT) AS acctbal_c,
        |    'delete' AS _change_type, CAST(1 AS BIGINT) AS _commit_version
        |  FROM customer WHERE c_acctbal < 0
        |  UNION ALL
        |  SELECT c_custkey, c_nationkey,
        |    CAST(ROUND(c_acctbal*100) AS BIGINT),
        |    'delete', CAST(2 AS BIGINT)
        |  FROM customer WHERE NOT (c_acctbal < 0) AND c_nationkey < 5
        |  UNION ALL
        |  SELECT c_custkey, c_nationkey,
        |    CAST(ROUND((c_acctbal+100)*100) AS BIGINT),
        |    'insert', CAST(2 AS BIGINT)
        |  FROM customer WHERE NOT (c_acctbal < 0) AND c_nationkey < 5)
        |SELECT * FROM chg
        |ORDER BY _commit_version, _change_type, c_custkey""".stripMargin,
    "d30_cdf" ->
      """WITH chg AS (
        |  SELECT s_suppkey, s_nationkey,
        |    CAST(ROUND(s_acctbal*100) AS BIGINT) AS bal_c,
        |    'delete' AS _change_type, CAST(2 AS BIGINT) AS _commit_version
        |  FROM supplier WHERE s_acctbal < 0
        |  UNION ALL
        |  SELECT s_suppkey, s_nationkey, CAST(ROUND(s_acctbal*100) AS BIGINT),
        |    'update_preimage', CAST(3 AS BIGINT)
        |  FROM supplier WHERE NOT (s_acctbal < 0) AND s_nationkey < 5
        |  UNION ALL
        |  SELECT s_suppkey, s_nationkey, CAST(ROUND((s_acctbal+10)*100) AS BIGINT),
        |    'update_postimage', CAST(3 AS BIGINT)
        |  FROM supplier WHERE NOT (s_acctbal < 0) AND s_nationkey < 5
        |  UNION ALL
        |  SELECT s_suppkey, s_nationkey,
        |    CAST(ROUND((s_acctbal + CASE WHEN s_nationkey < 5 THEN 10 ELSE 0 END)*100)
        |      AS BIGINT),
        |    'update_preimage', CAST(4 AS BIGINT)
        |  FROM supplier WHERE s_suppkey <= 10 AND s_acctbal >= 0
        |  UNION ALL
        |  SELECT s_suppkey, s_nationkey, CAST(5500 AS BIGINT),
        |    'update_postimage', CAST(4 AS BIGINT)
        |  FROM supplier WHERE s_suppkey <= 10 AND s_acctbal >= 0
        |  UNION ALL
        |  SELECT s_suppkey + 100000, s_nationkey, CAST(ROUND(s_acctbal*100) AS BIGINT),
        |    'insert', CAST(4 AS BIGINT)
        |  FROM supplier WHERE s_suppkey <= 10 AND s_acctbal >= 0)
        |SELECT * FROM chg
        |ORDER BY _commit_version, _change_type, s_suppkey""".stripMargin,
    "d31_generated" ->
      """SELECT o_orderkey,
        | CAST(year(CASE WHEN o_orderkey < 100
        |   THEN o_orderdate + INTERVAL 400 DAY ELSE o_orderdate END) AS INT)
        |   AS o_year,
        | CAST(ROUND(o_totalprice*100) AS BIGINT) AS total_c
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "d34_row_tracking" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        | CAST(count(*) AS BIGINT) AS n_distinct_ids,
        | CAST(0 AS BIGINT) AS n_rehomed,
        | CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_c
        |FROM orders
        |WHERE NOT (o_orderkey >= 1000 AND o_orderkey < 2000)""".stripMargin,
    "d33_ict" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_total,
        | CAST(3 AS BIGINT) AS n_stamped,
        | CAST(1 AS BIGINT) AS monotonic_ok,
        | CAST(SUM(CASE WHEN n_nationkey < 20 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_at_v1
        |FROM nation""".stripMargin,
    "d32_identity" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_total,
        | CAST(count(*) AS BIGINT) AS n_distinct_ids,
        | CAST(count(*) AS BIGINT) AS n_aligned,
        | CAST(SUM(CASE WHEN o_orderkey >= 3000 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_alloc_above,
        | CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_c
        |FROM orders""".stripMargin,
    "d14_delete" ->
      """SELECT o_orderkey, o_orderstatus,
        | CAST(ROUND(o_totalprice*100) AS BIGINT) AS total_c,
        | (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
        |  WHERE o_orderstatus = 'F' OR o_totalprice > 150000) AS n_deleted
        |FROM orders
        |WHERE NOT (o_orderstatus = 'F' OR o_totalprice > 150000)
        |ORDER BY o_orderkey""".stripMargin,
    "d15_update" ->
      """SELECT s_suppkey, s_nationkey,
        | CAST(ROUND((CASE WHEN s_nationkey < 5 THEN s_acctbal + 100 ELSE s_acctbal END)*100) AS BIGINT) AS acctbal_c,
        | (SELECT CAST(COUNT(*) AS BIGINT) FROM supplier WHERE s_nationkey < 5) AS n_updated
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "d16_merge" ->
      """WITH merged AS (
        |  SELECT c_custkey, c_name, c_nationkey,
        |    CASE WHEN c_custkey <= 300 THEN c_acctbal + 1000 ELSE c_acctbal END AS bal
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey + 1000000, 'new customer', c_nationkey, c_acctbal
        |  FROM customer WHERE c_custkey <= 50)
        |SELECT c_custkey, c_name, c_nationkey,
        |  CAST(ROUND(bal*100) AS BIGINT) AS acctbal_c,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM customer WHERE c_custkey <= 300) AS n_matched,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM customer WHERE c_custkey <= 50) AS n_inserted
        |FROM merged ORDER BY c_custkey""".stripMargin,
    "d12_write_modes" ->
      """SELECT r_regionkey, r_name FROM (
        | SELECT r_regionkey, r_name FROM region
        | UNION ALL SELECT r_regionkey, r_name FROM region
        | UNION ALL SELECT r_regionkey, r_name FROM region) u
        |ORDER BY r_regionkey, r_name""".stripMargin
  )
}
