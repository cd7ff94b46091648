package graft.sources

import graft.delta.{DeltaLog, DeltaRead, DeltaWrite, Predicate, Snapshot}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SaveMode}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** `spark.read.format("graft")` / `df.write.format("graft")` — the
  * data-source registration for the engine, so the Delta table surface
  * composes with Spark's own reader/writer API:
  *
  * {{{
  * spark.read.format("graft").option("versionAsOf", 3).load(path)
  * df.write.format("graft").mode("append").option("partitionBy", "k").save(path)
  * }}}
  *
  * The relation implements PrunedFilteredScan: Catalyst hands it the
  * required columns and the pushable filters, which are translated into
  * the engine's DNF predicates — so LOG-LEVEL partition pruning and
  * parquet row-group pushdown fire through the format() API exactly as
  * through GraftDelta.readDelta. (Spark re-evaluates all filters above
  * the scan, so partial translation is always safe.)
  */
class GraftSource
    extends RelationProvider
    with SchemaRelationProvider
    with CreatableRelationProvider
    with StreamSourceProvider
    with StreamSinkProvider
    with DataSourceRegister {

  override def shortName(): String = "graft"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("Please provide a Delta table path"))

  // ---- streaming read: spark.readStream.format("graft").load(path) ----
  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse {
      val base = graft.delta.DeltaLog
        .forTable(sqlContext.sparkSession, pathOf(parameters))
        .snapshot(None).schema
      // changeFeed mode appends the CDC columns — must match what the
      // created GraftStreamSource will declare, or batches are rejected
      val cf = parameters.collectFirst {
        case (k, v) if k.equalsIgnoreCase("changeFeed") => v.toBoolean
      }.getOrElse(false)
      if (!cf) base
      else StructType(base.fields :+
        org.apache.spark.sql.types.StructField(
          graft.delta.ChangeFeed.ChangeTypeCol,
          org.apache.spark.sql.types.StringType, nullable = false) :+
        org.apache.spark.sql.types.StructField(
          graft.delta.ChangeFeed.CommitVersionCol,
          org.apache.spark.sql.types.LongType, nullable = false) :+
        org.apache.spark.sql.types.StructField(
          graft.delta.ChangeFeed.CommitTimestampCol,
          org.apache.spark.sql.types.TimestampType, nullable = false))
    })

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): org.apache.spark.sql.execution.streaming.Source =
    new graft.streaming.GraftStreamSource(sqlContext, pathOf(parameters), parameters)

  // ---- streaming write: df.writeStream.format("graft").start(path) ----
  /** Exactly-once streaming sink: each micro-batch appends atomically
    * WITH a SetTransaction (appId scoped to the query's checkpoint, so a
    * restart resumes the same idempotency watermark and replayed batches
    * skip) — `graft.streaming.DeltaSink`'s protocol behind the standard
    * `format("graft")` writer registration. */
  override def createSink(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    require(outputMode == org.apache.spark.sql.streaming.OutputMode.Append(),
      s"graft streaming sink supports Append output mode, found $outputMode " +
        "(aggregations need watermark + append, or route through foreachBatch)")
    val path = pathOf(parameters)
    val appId = parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase("txnAppId") => v
    }.getOrElse {
      val ckpt = parameters.collectFirst {
        case (k, v) if k.equalsIgnoreCase("checkpointLocation") => v
      }.getOrElse(throw new IllegalArgumentException(
        "graft sink needs a checkpointLocation (the idempotency scope) " +
          "or an explicit txnAppId option"))
      "graft-sink-" + java.util.UUID.nameUUIDFromBytes(
        ckpt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    val parts = parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase("partitionBy") =>
        v.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    }.getOrElse(partitionColumns)
    new org.apache.spark.sql.execution.streaming.Sink {
      override def addBatch(batchId: Long, data: DataFrame): Unit = {
        val batch = org.apache.spark.sql.graft.StreamingBridge.asBatchFrame(data)
        graft.streaming.DeltaSink.addBatch(batch, path, appId, batchId, parts)
        ()
      }
      override def toString: String = s"GraftSink[$path]"
    }
  }

  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("Please provide a Delta table path"))
    val opt: String => Option[String] = key =>
      parameters.collectFirst { case (k, v) if k.equalsIgnoreCase(key) => v }
    if (opt("readChangeFeed").exists(_.toBoolean)) {
      // batch CDF read through reader options (delta-spark parity):
      // startingVersion/endingVersion or startingTimestamp/endingTimestamp
      // bound the commit range; the result is the engine's change feed
      // (_change_type/_commit_version/_commit_timestamp columns)
      require(opt("versionAsOf").isEmpty && opt("timestampAsOf").isEmpty,
        "readChangeFeed cannot combine with versionAsOf/timestampAsOf — " +
          "the feed IS a range read; bound it with startingVersion/endingVersion")
      val spark = sqlContext.sparkSession
      val cdf = (opt("startingVersion"), opt("startingTimestamp")) match {
        case (Some(_), Some(_)) => throw new IllegalArgumentException(
          "Set startingVersion OR startingTimestamp, not both")
        case (Some(v), None) =>
          graft.delta.GraftDelta.tableChanges(spark, path, v.toLong,
            opt("endingVersion").map(_.toLong))
        case (None, Some(ts)) =>
          graft.delta.GraftDelta.tableChangesByTimestamp(spark, path,
            DeltaRead.parseTimestampMillis(ts),
            opt("endingTimestamp").map(DeltaRead.parseTimestampMillis))
        case (None, None) => throw new IllegalArgumentException(
          "readChangeFeed needs startingVersion or startingTimestamp")
      }
      val outerCtx = sqlContext
      new BaseRelation with TableScan {
        override def sqlContext: SQLContext = outerCtx
        override def schema: StructType = cdf.schema
        override def buildScan(): RDD[Row] = cdf.rdd
      }
    } else
      GraftRelation(sqlContext, path,
        version = opt("versionAsOf").map(_.toLong),
        timestamp = opt("timestampAsOf"))
  }

  /** User-declared schema path (`CREATE TABLE name (cols…) USING graft
    * LOCATION p` with no AS SELECT): an absent table is CREATED empty —
    * commit 0 carries the metadata and zero adds — and an existing
    * table's declared schema must agree with the log's (names + types,
    * nullability and metadata free) or the DDL refuses loudly instead of
    * silently shadowing the real schema. */
  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      schema: StructType): BaseRelation = {
    val path = pathOf(parameters)
    val spark = sqlContext.sparkSession
    val log = DeltaLog.forTable(spark, path)
    if (!log.tableExists) {
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], schema)
      DeltaWrite.write(empty, path,
        partitionBy = parameters.get("partitionBy")
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil))
    } else {
      def shape(st: StructType): Seq[(String, String)] =
        st.fields.toSeq.map(f => (f.name.toLowerCase, f.dataType.sql))
      val cur = log.snapshot(None).schema
      require(shape(cur) == shape(schema),
        s"Declared schema ${schema.simpleString} does not match the existing " +
          s"table at $path: ${cur.simpleString}")
    }
    createRelation(sqlContext, parameters)
  }

  override def createRelation(
      sqlContext: SQLContext,
      mode: SaveMode,
      parameters: Map[String, String],
      data: DataFrame): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("Please provide a Delta table path"))
    val writeMode = mode match {
      case SaveMode.ErrorIfExists => "error"
      case SaveMode.Append => "append"
      case SaveMode.Overwrite => "overwrite"
      case SaveMode.Ignore => "ignore"
    }
    // idempotent batch writes (the delta-spark txnAppId/txnVersion
    // options): the commit carries a SetTransaction, and a retried job
    // whose (appId, version) the table has already recorded SKIPS the
    // write instead of appending duplicates — the batch flavor of the
    // streaming sink's exactly-once protocol (graft.streaming.DeltaSink)
    val txn = (parameters.get("txnAppId"), parameters.get("txnVersion")) match {
      case (Some(app), Some(v)) =>
        Some(graft.delta.SetTransaction(app, v.toLong,
          Some(System.currentTimeMillis())))
      case (None, None) => None
      case _ => throw new IllegalArgumentException(
        "txnAppId and txnVersion must be set together")
    }
    val alreadyCommitted = txn.exists { t =>
      val log = DeltaLog.forTable(sqlContext.sparkSession, path)
      log.tableExists &&
        log.snapshot(None).setTransactions
          .find(_.appId == t.appId).exists(_.version >= t.version)
    }
    // replaceWhere (delta-spark writer option): predicate-scoped
    // overwrite — lowered through the same DNF language as the SQL
    // surface (unsupported shapes refuse loudly, never scan wrong)
    val replaceWhere = parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase("replaceWhere") => v
    }.map { w =>
      val spark = sqlContext.sparkSession
      val colType: String => Option[org.apache.spark.sql.types.DataType] =
        if (DeltaLog.forTable(spark, path).tableExists)
          graft.sql.GraftSql.colTypesOf(spark, path)
        else _ => None
      graft.sql.GraftSql.dnfOf(spark, Some(w), colType)
    }.getOrElse(Nil)
    if (!alreadyCommitted)
      DeltaWrite.write(data, path, mode = writeMode,
        partitionBy = parameters.get("partitionBy")
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil),
        overwriteSchema = parameters.get("overwriteSchema").exists(_.toBoolean),
        mergeSchema = parameters.get("mergeSchema").exists(_.toBoolean),
        txn = txn,
        replaceWhere = replaceWhere)
    GraftRelation(sqlContext, path, None, None)
  }
}

final case class GraftRelation(
    sqlContext: SQLContext,
    path: String,
    version: Option[Long],
    timestamp: Option[String])
    extends BaseRelation
    with PrunedFilteredScan {

  private lazy val snap: Snapshot = {
    val spark = sqlContext.sparkSession
    val log = DeltaLog.forTable(spark, path)
    val pinned = (version, timestamp) match {
      case (Some(v), _) => Some(v)
      case (None, Some(ts)) => Some(log.versionAtOrBefore(DeltaRead.parseTimestampMillis(ts)))
      case _ => None
    }
    log.snapshot(pinned)
  }

  override def schema: StructType = snap.schema

  override def buildScan(requiredColumns: Array[String], filters: Array[Filter]): RDD[Row] = {
    val preds = filters.flatMap(toPredicate)
    val dnf = if (preds.isEmpty) Nil else Seq(preds.toSeq)
    DeltaRead.fromSnapshot(sqlContext.sparkSession, path, snap,
      columns = requiredColumns.toSeq, filters = dnf).rdd
  }

  /** Translate the pushable subset of Spark's source filters into the
    * engine's predicates; untranslated filters are simply not pushed. */
  private def toPredicate(f: Filter): Option[Predicate] = f match {
    case EqualTo(a, v) => Some(Predicate(a, "==", v))
    case GreaterThan(a, v) => Some(Predicate(a, ">", v))
    case GreaterThanOrEqual(a, v) => Some(Predicate(a, ">=", v))
    case LessThan(a, v) => Some(Predicate(a, "<", v))
    case LessThanOrEqual(a, v) => Some(Predicate(a, "<=", v))
    case In(a, vs) => Some(Predicate(a, "in", vs.toSeq))
    case _ => None
  }
}
