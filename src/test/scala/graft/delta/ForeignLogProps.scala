package graft.delta

import org.apache.spark.sql.types.{LongType, MetadataBuilder, StringType, StructField, StructType, VariantType}
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Foreign-log fuzzing: random action interleavings — DV incarnations,
  * descriptor-less removes, repeated adds, metadata/txn/domain churn,
  * checkpoints (classic AND v2) at random versions with the JSON tail
  * deleted — replayed against an independent model of the protocol's
  * reconciliation rules (per-commit batches, removes-before-adds,
  * DV-uniqueId-keyed eviction, latest-txn-per-app, latest-domain).
  * This engine must read logs it didn't write; the generator emits the
  * interleavings a zoo of foreign writers could. */
object ForeignLogProps extends Properties("ForeignLogReplay") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12).withMaxSize(24)

  private lazy val spark = TestBase.spark

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  // schema-evolution churn: replay must surface the LATEST metadata,
  // with VARIANT fields and CURRENT_DEFAULT / typeChanges field metadata
  // surviving the schemaString round trip and checkpoints byte-for-byte
  private val schemas: Seq[StructType] = Seq(
    schema,
    StructType(Seq(
      StructField("k", LongType), StructField("v", StringType),
      StructField("payload", VariantType))),
    StructType(Seq(
      StructField("k", LongType),
      StructField("v", StringType, nullable = true,
        new MetadataBuilder().putString("CURRENT_DEFAULT", "'NEW'").build()),
      StructField("extra", LongType, nullable = true,
        new MetadataBuilder().putMetadataArray("delta.typeChanges", Array(
          new MetadataBuilder().putString("fromType", "integer")
            .putString("toType", "long").build())).build()))))

  private def meta(id: String) = MetadataAction(
    id = id, schemaString = schema.json, configuration = Map.empty)

  private val metaGen: Gen[Action] = for {
    s <- Gen.oneOf(schemas)
    nIdx <- Gen.oneOf("2", "32", "-1")
  } yield MetadataAction(id = "fuzz-1", schemaString = s.json,
    configuration = Map("delta.dataSkippingNumIndexedCols" -> nIdx))

  private val paths = (0 to 5).map(i => s"part-$i.parquet")
  private val dvs: Seq[Option[DeletionVectorDescriptor]] = Seq(
    None,
    Some(DeletionVectorDescriptor("i", "aBcDeFgH", None, 8, 2)),
    Some(DeletionVectorDescriptor("i", "zYxWvUtS", Some(0), 8, 3)))

  private val addGen: Gen[Action] = for {
    p <- Gen.oneOf(paths)
    dv <- Gen.oneOf(dvs)
    dc <- Gen.oneOf(true, true, false) // mostly dataChange
  } yield AddFile(p, size = 10L, modificationTime = 1000L, dataChange = dc,
    deletionVector = dv)

  private val removeGen: Gen[Action] = for {
    p <- Gen.oneOf(paths)
    dv <- Gen.oneOf(dvs)
  } yield RemoveFile(p, deletionTimestamp = Some(2000L), deletionVector = dv)

  private val txnGen: Gen[Action] = for {
    app <- Gen.oneOf("appA", "appB")
    v <- Gen.chooseNum(0L, 50L)
  } yield SetTransaction(app, v)

  private val domainGen: Gen[Action] = for {
    // delta.clustering rides along: the liquid-clustering spec must
    // survive replay + checkpoint round trips like any domain (its
    // payload shape is the delta-spark clusteringColumns encoding)
    d <- Gen.oneOf("dom.x", "dom.y", "delta.clustering")
    removed <- Gen.prob(0.2)
    cfg <-
      if (d == "delta.clustering")
        Gen.someOf(Seq("k", "v")).map(cols =>
          s"""{"clusteringColumns":${cols.map(c => s"""["$c"]""").mkString("[", ",", "]")}}""")
      else Gen.chooseNum(0, 9).map(n => s"""{"n":$n}""")
  } yield DomainMetadata(d, cfg, removed)

  private val cdcGen: Gen[Action] = Gen.oneOf(paths).map(p =>
    AddCDCFile(s"_change_data/$p", size = 5L))

  private val actionGen: Gen[Action] =
    Gen.frequency(5 -> addGen, 3 -> removeGen, 1 -> txnGen, 1 -> domainGen,
      1 -> cdcGen, // cdc never contributes to table state — replay ignores it
      1 -> metaGen)

  private val commitGen: Gen[Seq[Action]] =
    Gen.chooseNum(1, 5).flatMap(n => Gen.listOfN(n, actionGen))

  private val logGen: Gen[Seq[Seq[Action]]] =
    Gen.chooseNum(1, 7).flatMap(n => Gen.listOfN(n, commitGen))

  // ---- independent model of the reconciliation rules --------------------

  private final case class Model(
      active: Map[String, String],        // path -> active incarnation dvId
      txns: Map[String, Long],            // appId -> latest version
      domains: Map[String, String],       // domain -> latest configuration
      schemaStr: String)                  // latest metadata's schemaString

  private def dvIdOf(d: Option[DeletionVectorDescriptor]): String =
    d.map(x => s"${x.storageType}${x.pathOrInlineDv}@${x.offset.getOrElse(0)}").getOrElse("")

  private def step(m: Model, commit: Seq[Action]): Model = {
    var active = m.active
    var txns = m.txns
    var domains = m.domains
    var schemaStr = m.schemaStr
    commit.foreach {
      case md: MetadataAction => schemaStr = md.schemaString
      case r: RemoveFile =>
        val rid = dvIdOf(r.deletionVector)
        if (r.deletionVector.isEmpty || active.get(r.path).contains(rid))
          active -= r.path
      case t: SetTransaction => txns += t.appId -> t.version
      case d: DomainMetadata =>
        if (d.removed) domains -= d.domain else domains += d.domain -> d.configuration
      case _ => ()
    }
    commit.foreach {
      // replay activates every add, dataChange or not (OPTIMIZE re-adds)
      case f: AddFile => active += f.path -> dvIdOf(f.deletionVector)
      case _ => ()
    }
    Model(active, txns, domains, schemaStr)
  }

  private def modelAt(commits: Seq[Seq[Action]], v: Int): Model =
    commits.take(v + 1).foldLeft(
      Model(Map.empty, Map.empty, Map.empty, schema.json))(step)

  private def observed(snap: Snapshot): Model = Model(
    snap.activeFiles.map(f => f.path -> dvIdOf(f.deletionVector)).toMap,
    snap.setTransactions.map(t => t.appId -> t.version).toMap,
    snap.domainMetadata,
    snap.metadata.schemaString)

  private def stage(commits: Seq[Seq[Action]], v2: Boolean): DeltaLog = {
    val dir = java.nio.file.Files.createTempDirectory("graft_fuzz").toString + "/t"
    val log = DeltaLog.forTable(spark, dir)
    val proto =
      if (v2) Protocol(3, 7,
        readerFeatures = Some(Seq("v2Checkpoint", "deletionVectors")),
        writerFeatures = Some(Seq("deletionVectors", "domainMetadata")))
      else Protocol(1, 2)
    commits.zipWithIndex.foreach { case (actions, i) =>
      val head: Seq[Action] =
        if (i == 0) Seq(proto, meta("fuzz-1")) else Nil
      log.writeCommit(i.toLong, head ++ actions)
    }
    log
  }

  property("replay at every version matches the model (no checkpoint)") =
    forAll(logGen) { commits =>
      val log = stage(commits, v2 = false)
      commits.indices.forall { v =>
        observed(log.snapshot(Some(v.toLong))) == modelAt(commits, v)
      }
    }

  property("checkpoint at a random version + deleted tail replays identically") =
    forAll(logGen, Gen.chooseNum(0, 100), Gen.prob(0.5)) { (commits, pick, v2) =>
      val log = stage(commits, v2)
      val cv = pick % commits.size
      log.writeCheckpoint(cv.toLong)
      // the tail at or before the checkpoint is no longer needed
      (0 to cv).foreach(v => log.fs.delete(log.commitFile(v.toLong), false))
      // explicitly uncached: the property IS the cold checkpoint replay
      val fresh = new DeltaLog(spark, log.tablePath)
      val latestOk =
        observed(fresh.snapshot(None)) == modelAt(commits, commits.size - 1)
      val atCpOk =
        observed(fresh.snapshot(Some(cv.toLong))) == modelAt(commits, cv)
      latestOk && atCpOk
    }

  property("checkpoint round-trip is replay-idempotent (checkpoint of a checkpoint)") =
    forAll(logGen, Gen.prob(0.5)) { (commits, v2) =>
      val log = stage(commits, v2)
      val last = (commits.size - 1).toLong
      log.writeCheckpoint(last)
      (0L to last).foreach(v => log.fs.delete(log.commitFile(v), false))
      // second checkpoint built purely FROM the first (uncached handles:
      // the property is replay-through-checkpoint, not cache service)
      val fresh = new DeltaLog(spark, log.tablePath)
      fresh.writeCheckpoint(last)
      val again = new DeltaLog(spark, log.tablePath)
      observed(again.snapshot(None)) == modelAt(commits, commits.size - 1)
    }

  // ---- stats compaction soundness ---------------------------------------

  private val statValueGen: Gen[(String, String)] = Gen.oneOf(
    Gen.chooseNum(-100000L, 100000L).map(v => (v.toString, v.toString)),
    Gen.chooseNum(-1000.0, 1000.0).map(v => (v.toString, v.toString)),
    Gen.chooseNum(1, 120).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString)
        .map(s => ("\"" + s + "\"", s))))

  /** compactStats must keep numRecords/nullCount verbatim, keep or
    * soundly weaken bounds (min: prefix ≤ original; max: verbatim or
    * dropped), and never emit a column outside the keep set. */
  property("compactStats preserves counts and only weakens bounds outward") =
    forAll(Gen.listOfN(4,
      for { n <- Gen.identifier.map(_.take(8)); v <- statValueGen } yield (n, v))) { cols0 =>
      val cols = cols0.distinctBy(_._1)
      val fields = cols.map { case (n, (json, _)) =>
        s""" "$n" : $json """
      }
      val verbose =
        s"""{
           |  "numRecords" : 42,
           |  "minValues" : { ${fields.mkString(",")} },
           |  "maxValues" : { ${fields.mkString(",")} },
           |  "nullCount" : { ${cols.map(c => s""" "${c._1}" : 1 """).mkString(",")} },
           |  "vendor" : { "x" : 1 }
           |}""".stripMargin
      val keep = cols.map(_._1).toSet
      val out = StatsPruning.compactStats(verbose, keep)
      val st = StatsPruning.parse(Some(out)).get
      val stIn = StatsPruning.parse(Some(verbose)).get
      st.numRecords.contains(42L) &&
        cols.forall { case (n, _) => st.nullCount.get(n).contains(1L) } &&
        cols.forall { case (n, (_, raw)) =>
          val minOk = (stIn.min.get(n), st.min.get(n)) match {
            case (Some(i: String), Some(o: String)) =>
              i.startsWith(o) && (o.length == i.length || o.length == 64)
            case (i, o) => i == o
          }
          val maxOk = (stIn.max.get(n), st.max.get(n)) match {
            case (Some(_: String), None) => raw.length > 64 // dropped iff oversized
            case (i, o) => i == o
          }
          minOk && maxOk
        } && !out.contains("vendor")
    }
}
