package graft.delta

import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the JSON codec and path/timestamp helpers — literal
  * lines lifted from the reference's golden fixture logs. */
class CodecSpec extends AnyFunSuite {

  test("parse add action from a fixture log line") {
    val line =
      """{"add":{"path":"part-00000-a72b1fb3-f2df-41fe-a8f0-e65b746382dd-c000.snappy.parquet","partitionValues":{},"size":262,"modificationTime":1587968586000,"dataChange":true}}"""
    val a = ActionCodec.fromJsonLine(line).get.asInstanceOf[AddFile]
    assert(a.path.startsWith("part-00000") && a.size == 262 && a.dataChange)
  }

  test("parse metaData and recover the Spark schema") {
    val line =
      """{"metaData":{"id":"5fba94ed-9794-4965-ba6e-6ee3c0d22af9","format":{"provider":"parquet","options":{}},"schemaString":"{\"type\":\"struct\",\"fields\":[{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}}]}","partitionColumns":[],"configuration":{},"createdTime":1587968585495}}"""
    val m = ActionCodec.fromJsonLine(line).get.asInstanceOf[MetadataAction]
    assert(m.schema.fieldNames.toSeq == Seq("id"))
    assert(m.schema.fields.head.dataType.typeName == "long")
  }

  test("actions survive a toJsonLine/fromJsonLine roundtrip") {
    val actions: Seq[Action] = Seq(
      AddFile("p=1/f.parquet", Map("p" -> "1"), 10, 99, dataChange = true, Some("""{"numRecords":1}""")),
      RemoveFile("f2.parquet", Some(123L), dataChange = true, Some(true), Map("p" -> null), Some(5L)),
      Protocol(1, 2),
      SetTransaction("app-1", 42L, Some(1L)),
      CommitInfo(1630942389906L, "WRITE", Map("mode" -> "Append"), Map("numFiles" -> "6"),
        Some(24L), Some(true)))
    actions.foreach { a =>
      assert(ActionCodec.fromJsonLine(ActionCodec.toJsonLine(a)).contains(a))
    }
  }

  test("null partition values round-trip as JSON null") {
    val a = AddFile("f.parquet", Map("k" -> null), 1, 1)
    val json = ActionCodec.toJsonLine(a)
    assert(json.contains(""""k":null"""))
    assert(ActionCodec.fromJsonLine(json).get.asInstanceOf[AddFile].partitionValues("k") == null)
  }

  test("unknown action types are ignored for forward compat; cdc + domainMetadata parse") {
    assert(ActionCodec.fromJsonLine("""{"someFutureAction":{"path":"x"}}""").isEmpty)
    // r7: v2Checkpoint actions are first-class now
    assert(ActionCodec.fromJsonLine("""{"sidecar":{"path":"x","sizeInBytes":9}}""")
      .contains(Sidecar("x", 9L)))
    assert(ActionCodec.fromJsonLine("""{"checkpointMetadata":{"version":4}}""")
      .contains(CheckpointMetadata(4L)))
    assert(ActionCodec.fromJsonLine("""{"cdc":{"path":"x"}}""")
      .contains(AddCDCFile("x")))
    // r5: domainMetadata is a first-class action (row tracking watermark)
    assert(ActionCodec.fromJsonLine(
      """{"domainMetadata":{"domain":"x","configuration":"{}","removed":false}}""")
      .contains(DomainMetadata("x", "{}", false)))
  }

  test("r5 protocol fields serialize under the spec's exact names (golden lines)") {
    val add = AddFile("f.parquet", Map.empty, 10, 20, dataChange = true,
      stats = Some("""{"numRecords":3}"""), baseRowId = Some(100L),
      defaultRowCommitVersion = Some(7L))
    val j = ActionCodec.toJsonLine(add)
    assert(j.contains(""""baseRowId":100""") &&
      j.contains(""""defaultRowCommitVersion":7"""), j)
    assert(ActionCodec.fromJsonLine(j).contains(add))

    val ci = CommitInfo(1000L, "WRITE", inCommitTimestamp = Some(2000L))
    val cj = ActionCodec.toJsonLine(ci)
    assert(cj.contains(""""inCommitTimestamp":2000"""), cj)
    assert(ActionCodec.fromJsonLine(cj).contains(ci))

    val dm = DomainMetadata("delta.rowTracking", """{"rowIdHighWaterMark":41}""")
    assert(ActionCodec.toJsonLine(dm) ==
      """{"domainMetadata":{"domain":"delta.rowTracking",""" +
        """"configuration":"{\"rowIdHighWaterMark\":41}","removed":false}}""")
    assert(ActionCodec.fromJsonLine(ActionCodec.toJsonLine(dm)).contains(dm))
  }

  test("partition values parse from hive paths incl null sentinel") {
    val pv = DeltaWrite.partitionValuesFromPath(
      "k=a/j=__HIVE_DEFAULT_PARTITION__/part-0.parquet", Seq("k", "j"))
    assert(pv == Map("k" -> "a", "j" -> null))
  }

  test("'+' in a partition value is NOT decoded to space (hive escaping)") {
    val pv = DeltaWrite.partitionValuesFromPath("k=a+b/part-0.parquet", Seq("k"))
    assert(pv("k") == "a+b")
  }

  test("%XX escapes in partition paths decode") {
    val pv = DeltaWrite.partitionValuesFromPath("k=a%20b%2Fc/part-0.parquet", Seq("k"))
    assert(pv("k") == "a b/c")
  }

  test("timestamp parsing accepts the reference's formats") {
    import DeltaRead.parseTimestampMillis
    assert(parseTimestampMillis("2020-05-01T00:47:31Z") == 1588294051000L)
    assert(parseTimestampMillis("2020-05-01 00:47:31") == 1588294051000L)
    assert(parseTimestampMillis("2020-05-01") == 1588291200000L)
    // RFC-3339 with offset, as used by test_core.py:188
    assert(parseTimestampMillis("2020-05-01T00:47:31-07:00") == 1588294051000L + 7 * 3600 * 1000L)
  }
}
