package graft

import java.nio.file.Files

import graft.api._
import graft.sources.JsonVectors

/** Replay of reference-shaped JSON payloads (insert.rs / upsert.rs)
  * into the Spark engine: parse fidelity, corrupt-line surfacing, and
  * end-to-end insertAll → search.
  */
class JsonVectorsSpec extends SparkSpec {

  private def write(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft-jsonl")
    Files.writeString(dir.resolve("payloads.jsonl"),
      lines.mkString("", "\n", "\n"))
    dir.toString
  }

  test("reads id/vectors/data; object data survives as raw json text") {
    val path = write(Seq(
      """{"id": 1, "vectors": [1.0, 2.0], "data": {"name":"sora","age":20}}""",
      """{"id": 2, "vectors": [3.5, -4.25]}""",
      """{"id": 3, "vectors": [0.0, 0.0], "data": "plain-string"}"""))
    val rows = JsonVectors.readValid(spark, path)
      .orderBy("id").collect()
    assert(rows.length === 3)
    assert(rows(0).getSeq[Float](1) === Seq(1f, 2f))
    assert(rows(0).getString(2).contains("\"age\":20"))
    assert(rows(1).getSeq[Float](1) === Seq(3.5f, -4.25f))
    assert(rows(1).isNullAt(2))
    assert(rows(2).getString(2) === "plain-string")
  }

  test("malformed lines surface as corrupt instead of vanishing") {
    val path = write(Seq(
      """{"id": 1, "vectors": [1.0]}""",
      """{"vectors": [2.0]}""",
      """{"id": 5}""",
      """not json at all"""))
    val all = JsonVectors.read(spark, path).collect()
    assert(all.length === 4)
    assert(all.count(_.getBoolean(3)) === 3)
    assert(JsonVectors.readValid(spark, path).count() === 1)
  }

  test("replayed payloads flow into VectorIndex.insertAll and search") {
    val path = write((1 to 20).map(i =>
      s"""{"id": $i, "vectors": [$i.0, 0.0], "data": {"k": $i}}"""))
    val idx = VectorIndex.create(spark, IndexType.FLAT, 2, Metric.L2)
      .insertAll(JsonVectors.readValid(spark, path))
    assert(idx.count === 20L)
    val hit = idx.search(Array(7f, 0f), 1).collect().head
    assert(hit.getLong(1) === 7L && hit.getDouble(2) === 0.0)
    assert(idx.query(7L).collect().head.getString(2).contains("\"k\":7")
      || idx.query(7L).collect().head.getString(2).contains("\"k\": 7"))
  }
}
