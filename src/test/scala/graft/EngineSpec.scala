package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.lake.Engine
import graft.schema.Json

/** Error-path behavior pins (SURVEY.md §2.A notes): every failure sets
  * has_error and *continues* — a response object is always produced and
  * persisted (`handler.py:49-52`, `iceberg_helper.py:218-222`).
  */
class EngineSpec extends AnyFunSuite {

  private def wh() = Files.createTempDirectory("graft-engine-test").toString

  test("missing file: has_error response, still persisted to _output") {
    val w = wh()
    val r = Engine.processTableDefFile(w, "/nonexistent/def.json")
    assert(r.hasError)
    assert(r.messageList.exists(_.contains("Failed to load")))
    assert(Files.exists(Paths.get(r.outputLocation)))
    val persisted = Json.parse(Files.readString(Paths.get(r.outputLocation))).asObj
    assert(persisted("has_error").asBool)
  }

  test("invalid JSON and structural validation produce itemized messages") {
    val w = wh()
    val bad = Engine.processTableDefJson(w, "{nope")
    assert(bad.hasError && bad.messageList.exists(_.contains("invalid JSON")))
    val invalid = Engine.processTableDefJson(w,
      """{"database_name":"d","table_name":"t","columns":[
        |{"column_name":"s","data_type":"struct"}],
        |"partitions":[{"column":"missing","transform":"boom"}]}""".stripMargin)
    assert(invalid.hasError)
    assert(invalid.messageList.exists(_.contains("struct type requires struct_def")))
    assert(invalid.messageList.exists(_.contains("unknown transform")))
    assert(invalid.messageList.exists(_.contains("not in columns")))
  }

  test("reprocessing an identical definition is a no-op ALTER") {
    val w = wh()
    val d = """{"database_name":"d","table_name":"t","columns":[
      |{"column_name":"a","data_type":"int"}],"partitions":[]}""".stripMargin
    val first = Engine.processTableDefJson(w, d)
    assert(first.changeType == "CREATE TABLE" && !first.hasError)
    val second = Engine.processTableDefJson(w, d)
    assert(second.changeType == "ALTER TABLE" && !second.hasError)
    assert(second.messageList.exists(_.contains("No schema changes detected")))
  }

  test("response JSON carries the reference's field names") {
    val w = wh()
    val r = Engine.processTableDefJson(w,
      """{"database_name":"d","table_name":"t2","columns":[
        |{"column_name":"a","data_type":"int"}],"partitions":[]}""".stripMargin)
    val m = Json.parse(r.toJsonString).asObj
    assert(m.keySet == Set("database_name", "table_name", "change_type",
      "message_list", "output_location", "has_error"))
    assert(m("change_type").asStr == "CREATE TABLE")
  }
}
