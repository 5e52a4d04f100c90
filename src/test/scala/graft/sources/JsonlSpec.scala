package graft.sources

import java.nio.file.{Files, Path}

import graft.SparkSpec
import org.apache.spark.sql.types.{LongType, StringType, StructType}

class JsonlSpec extends SparkSpec {
  import spark.implicits._

  private val schema = new StructType()
    .add("id", LongType).add("text", StringType)

  private def write(lines: String*): Path = {
    val dir = Files.createTempDirectory("graft-jsonl")
    Files.writeString(dir.resolve("part-0.json"), lines.mkString("\n"))
    dir
  }

  test("clean lines parse exactly; malformed and wrong-typed lines quarantine raw") {
    val dir = write(
      """{"id": 1, "text": "alpha"}""",
      """{"id": 2, "text": "beta with \"quotes\""}""",
      """{"id": 3, "text":""", // truncated
      """garbage line""", // not JSON
      """{"id": "three", "text": "wrong type"}""") // type mismatch
    val raw = Jsonl.readWithQuarantine(spark, dir.toString, schema)
    val good = Jsonl.good(raw).as[(Long, String)].collect().sortBy(_._1)
    assert(good.toSeq == Seq((1L, "alpha"), (2L, "beta with \"quotes\"")))
    val bad = Jsonl.quarantine(raw).as[String].collect().sorted
    assert(bad.length == 3)
    // raw lines survive VERBATIM for audit/re-parse
    assert(bad.contains("garbage line"))
    assert(bad.exists(_.contains("\"three\"")))
  }

  test("all-clean and all-corrupt inputs both round trip; schema must not collide") {
    val clean = write("""{"id": 7, "text": "x"}""")
    val rawClean = Jsonl.readWithQuarantine(spark, clean.toString, schema)
    assert(Jsonl.good(rawClean).count() == 1 && Jsonl.quarantine(rawClean).count() == 0)
    val dirty = write("{{{", "]")
    val rawDirty = Jsonl.readWithQuarantine(spark, dirty.toString, schema)
    assert(Jsonl.good(rawDirty).count() == 0 && Jsonl.quarantine(rawDirty).count() == 2)
    intercept[IllegalArgumentException] {
      Jsonl.readWithQuarantine(spark, clean.toString,
        schema.add(Jsonl.CorruptCol, StringType))
    }
  }
}
