package graft.delta

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property-based write→read roundtrips (SURVEY §5): random row sets
  * with adversarial partition values — hive-escaped specials ('+', '%',
  * '/', '=', spaces, unicode), nulls — must survive the full
  * stage-write → URI-encoded add.path → log replay → hive-unescape →
  * partition-cast pipeline bit-for-bit. */
object RoundtripProps extends Properties("DeltaRoundtrip") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6).withMaxSize(40)

  private lazy val spark = TestBase.spark

  private val trickyKey: Gen[String] = Gen.oneOf(
    "plain", "a b", "a+b", "a%2Fb", "x=y", "slash/val", "100%", "ünïcode", "dot.dot")

  private val rowGen: Gen[(Long, Option[String], Double, Option[Long])] =
    for {
      id <- Gen.chooseNum(0L, 1000000L)
      key <- Gen.option(trickyKey)
      d <- Gen.chooseNum(-1e6, 1e6) // finite doubles only
      ol <- Gen.option(Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2))
    } yield (id, key, d, ol)

  private def canon(rows: Seq[(Long, Option[String], Double, Option[Long])]) =
    rows.map(r => s"${r._1}|${r._2.orNull}|${r._3}|${r._4.map(_.toString).orNull}").sorted

  property("partitioned write/read preserves every row and partition value") =
    forAll(Gen.nonEmptyListOf(rowGen)) { rows =>
      import spark.implicits._
      val path = java.nio.file.Files.createTempDirectory("graft_prop").toString + "/t"
      val df = rows.toDF("id", "key", "d", "ol")
      GraftDelta.toDelta(df, path, partitionBy = Seq("key"))
      val back = GraftDelta.readDelta(spark, path)
        .select($"id", $"key", $"d", $"ol")
        .as[(Long, Option[String], Double, Option[Long])]
        .collect().toSeq
      canon(back) == canon(rows)
    }

  property("append accumulates the multiset exactly; v0 stays pinned") =
    forAll(Gen.nonEmptyListOf(rowGen), Gen.nonEmptyListOf(rowGen)) { (a, b) =>
      import spark.implicits._
      val path = java.nio.file.Files.createTempDirectory("graft_prop2").toString + "/t"
      GraftDelta.toDelta(a.toDF("id", "key", "d", "ol"), path)
      GraftDelta.toDelta(b.toDF("id", "key", "d", "ol"), path, mode = "append")
      def read(v: Option[Long]) = GraftDelta.readDelta(spark, path, version = v)
        .select($"id", $"key", $"d", $"ol")
        .as[(Long, Option[String], Double, Option[Long])].collect().toSeq
      canon(read(None)) == canon(a ++ b) && canon(read(Some(0L))) == canon(a)
    }

  property("partition filter equals post-hoc filter (pruning is invisible)") =
    forAll(Gen.nonEmptyListOf(rowGen), trickyKey) { (rows, k) =>
      import spark.implicits._
      val path = java.nio.file.Files.createTempDirectory("graft_prop3").toString + "/t"
      GraftDelta.toDelta(rows.toDF("id", "key", "d", "ol"), path, partitionBy = Seq("key"))
      val pruned = GraftDelta.readDelta(spark, path,
          filters = Seq(Seq(Predicate("key", "==", k))))
        .select($"id").as[Long].collect().sorted.toSeq
      val expected = rows.filter(_._2.contains(k)).map(_._1).sorted
      pruned == expected
    }
}
