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

  // ---- complex types (r12 VERDICT missing #2) -----------------------------
  // forAllNoShrink: shrinking invents values OUTSIDE the generators'
  // domain (decimals of arbitrary scale), which the (10,2)/(38,6) casts
  // would silently round — the comparison oracle only holds on the
  // generated domain. Decimals travel as STRINGS into the frame: the
  // tuple encoder's default DecimalType(38,18) cannot carry a (38,6)
  // value with >20 integer digits.

  /** decimal(38,6) values across both parquet backings: int64-range
    * unscaled longs AND 30-digit unscaled BigInts (fixed-len binary). */
  private val dec6: Gen[BigDecimal] = Gen.oneOf(
    Gen.chooseNum(-999999999999L, 999999999999L).map(n => BigDecimal(BigInt(n), 6)),
    for {
      ds <- Gen.listOfN(30, Gen.choose(0, 9))
      neg <- Gen.oneOf(true, false)
    } yield BigDecimal(BigInt(ds.mkString) * (if (neg) -1 else 1), 6))

  /** small decimal partition domain, negatives and zero included —
    * partition-dir strings like "-1.50" must cast back exactly. */
  private val decPart: Gen[BigDecimal] =
    Gen.chooseNum(-3L, 3L).map(n => BigDecimal(BigInt(n * 50), 2))

  private val tagGen: Gen[List[String]] =
    Gen.listOf(Gen.oneOf("a", "b", "ünï", "x y", "%41"))

  private val cRowGen: Gen[(Long, String, String, List[Long], List[String], Long)] =
    for {
      id <- Gen.chooseNum(0L, 1000000L)
      dec <- dec6
      part <- decPart
      arr <- Gen.listOf(Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2))
      tags <- tagGen
      n <- Gen.chooseNum(-1000L, 1000L)
    } yield (id, dec.bigDecimal.toPlainString, part.bigDecimal.toPlainString,
      arr, tags, n)

  private def canonC(
      rows: Seq[(Long, String, String, List[Long], List[String], Long)]) =
    rows.map(r => s"${r._1}|${BigDecimal(r._2)}|${BigDecimal(r._3)}|" +
      s"${r._4.mkString(",")}|${r._5.mkString(",")}|${r._6}").sorted

  property("decimal/array/map/struct roundtrip through the engine write path") =
    org.scalacheck.Prop.forAllNoShrink(Gen.nonEmptyListOf(cRowGen)) { rows =>
      import spark.implicits._
      val path = java.nio.file.Files.createTempDirectory("graft_propc").toString + "/t"
      val df = rows.toDF("id", "dec", "part", "arr", "tags", "n")
        .select($"id", $"dec".cast("decimal(38,6)").as("dec"),
          $"part".cast("decimal(10,2)").as("part"), $"arr",
          org.apache.spark.sql.functions.map(
            org.apache.spark.sql.functions.lit("k"), $"n").as("mp"),
          org.apache.spark.sql.functions.struct($"tags".as("tags"), $"n".as("nn"))
            .as("nested"))
      GraftDelta.toDelta(df, path, partitionBy = Seq("part"))
      val back = GraftDelta.readDelta(spark, path)
        .select($"id", $"dec".cast("string"), $"part".cast("string"),
          $"arr", $"nested.tags",
          org.apache.spark.sql.functions.element_at($"mp", "k"))
        .as[(Long, String, String, List[Long], List[String], Long)]
        .collect().toSeq
      canonC(back) == canonC(rows)
    }

  property("decimal partition + stats filters equal post-hoc filters") =
    org.scalacheck.Prop.forAllNoShrink(Gen.nonEmptyListOf(cRowGen)) { rows =>
      import spark.implicits._
      val path = java.nio.file.Files.createTempDirectory("graft_propd").toString + "/t"
      val df = rows.toDF("id", "dec", "part", "arr", "tags", "n")
        .select($"id", $"dec".cast("decimal(38,6)").as("dec"),
          $"part".cast("decimal(10,2)").as("part"))
        .repartition(3)
      GraftDelta.toDelta(df, path, partitionBy = Seq("part"))
      val k = BigDecimal(rows.head._3)
      val byPart = GraftDelta.readDelta(spark, path,
          filters = Seq(Seq(Predicate("part", "==", k))))
        .select($"id").as[Long].collect().sorted.toSeq
      val pivot = BigDecimal(rows.head._2)
      val byStats = GraftDelta.readDelta(spark, path,
          filters = Seq(Seq(Predicate("dec", "<=", pivot))))
        .select($"id").as[Long].collect().sorted.toSeq
      byPart == rows.filter(r => BigDecimal(r._3) == k).map(_._1).sorted &&
        byStats == rows.filter(r => BigDecimal(r._2) <= pivot).map(_._1).sorted
    }
}
