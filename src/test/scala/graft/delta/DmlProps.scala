package graft.delta

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property pins for DeltaDml: against random tables and random DNF
  * predicates, the committed DELETE/UPDATE/MERGE result must equal the
  * trivially-correct dataframe expression of the same operation — the
  * whole pruning / matched-count / partial-rewrite machinery has to be
  * invisible in the data. */
object DmlProps extends Properties("DeltaDml") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5).withMaxSize(60)

  private lazy val spark = TestBase.spark

  private val rowGen: Gen[(Long, Option[Long], String)] =
    for {
      id <- Gen.chooseNum(0L, 400L) // tight range → real duplicate/match density
      v <- Gen.option(Gen.chooseNum(-50L, 50L))
      s <- Gen.oneOf("a", "b", "c", "dd")
    } yield (id, v, s)

  // random DNF over (id range conjunct [+ nullable-col conjunct]) OR (tag)
  private val predGen: Gen[Seq[Seq[Predicate]]] =
    for {
      lo <- Gen.chooseNum(0L, 300L)
      hi <- Gen.chooseNum(lo, 400L)
      useV <- Gen.oneOf(true, false)
      vCut <- Gen.chooseNum(-40L, 40L)
      tag <- Gen.oneOf("a", "b", "zzz")
    } yield {
      val conj = Seq(Predicate("id", ">=", lo), Predicate("id", "<=", hi)) ++
        (if (useV) Seq(Predicate("v", ">", vCut)) else Nil)
      Seq(conj, Seq(Predicate("s", "==", tag)))
    }

  private def canon(rows: Seq[(Long, Option[Long], String)]): Seq[String] =
    rows.map(r => s"${r._1}|${r._2.map(_.toString).orNull}|${r._3}").sorted

  private def freshPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_dmlprop_$tag").toString + "/t"

  property("delete(pred) leaves exactly the rows where pred is not true") =
    forAll(Gen.nonEmptyListOf(rowGen), predGen) { (rows, pred) =>
      import spark.implicits._
      val path = freshPath("d")
      GraftDelta.toDelta(rows.toDF("id", "v", "s").repartition(4), path)
      val res = GraftDelta.deleteWhere(spark, path, pred)
      val back = GraftDelta.readDelta(spark, path)
        .as[(Long, Option[Long], String)].collect().toSeq
      val keep = rows.toDF("id", "v", "s")
        .filter(!coalesce(DeltaRead.dnfToColumn(pred), lit(false)))
        .as[(Long, Option[Long], String)].collect().toSeq
      canon(back) == canon(keep) &&
        res.affectedRows == rows.size - keep.size
    }

  property("update(pred, set) equals the CASE-WHEN expression of the same") =
    forAll(Gen.nonEmptyListOf(rowGen), predGen) { (rows, pred) =>
      import spark.implicits._
      val path = freshPath("u")
      GraftDelta.toDelta(rows.toDF("id", "v", "s").repartition(3), path)
      val res = GraftDelta.updateWhere(spark, path, pred,
        Map("v" -> (coalesce($"v", lit(0L)) + 1000L), "s" -> concat($"s", lit("!"))))
      val back = GraftDelta.readDelta(spark, path)
        .as[(Long, Option[Long], String)].collect().toSeq
      val m = coalesce(DeltaRead.dnfToColumn(pred), lit(false))
      val expected = rows.toDF("id", "v", "s")
        .select($"id",
          when(m, coalesce($"v", lit(0L)) + 1000L).otherwise($"v").as("v"),
          when(m, concat($"s", lit("!"))).otherwise($"s").as("s"))
        .as[(Long, Option[Long], String)].collect().toSeq
      canon(back) == canon(expected) &&
        back.size == rows.size &&
        res.affectedRows == rows.toDF("id", "v", "s").filter(m).count()
    }

  property("merge upsert equals anti-union of source over target by key") =
    forAll(Gen.nonEmptyListOf(rowGen), Gen.nonEmptyListOf(rowGen)) { (tgt, srcRaw) =>
      import spark.implicits._
      val path = freshPath("m")
      GraftDelta.toDelta(tgt.toDF("id", "v", "s").repartition(3), path)
      // merge requires unique source keys: keep one row per id
      val src = srcRaw.groupBy(_._1).map(_._2.head).toSeq
      GraftDelta.mergeInto(spark, path, src.toDF("id", "v", "s"), on = Seq("id"))
      val back = GraftDelta.readDelta(spark, path)
        .as[(Long, Option[Long], String)].collect().toSeq
      // every matched target row (duplicates included) takes the source
      // row's values; unmatched source rows insert once
      val srcById = src.map(r => r._1 -> r).toMap
      val tgtIds = tgt.map(_._1).toSet
      val expected = tgt.map(r => srcById.getOrElse(r._1, r)) ++
        src.filterNot(r => tgtIds.contains(r._1))
      canon(back) == canon(expected)
    }
}
