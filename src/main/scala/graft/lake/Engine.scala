package graft.lake

import java.nio.file.{Files, Paths}

import graft.schema._

/** Result object mirroring the reference's `ProcessSchemaResponse`
  * dataclass (`process_schema_response.py:5-17`): change_type ∈
  * {TBD, CREATE TABLE, ALTER TABLE}; every failure path sets
  * has_error and *continues* (`handler.py:49-52`,
  * `iceberg_helper.py:218-222`).
  */
case class ProcessSchemaResponse(
    databaseName: String,
    tableName: String,
    changeType: String,
    messageList: Seq[String],
    outputLocation: String,
    hasError: Boolean) {
  def toJsonString: String = Json.write(JObject(Map(
    "database_name" -> JString(databaseName),
    "table_name" -> JString(tableName),
    "change_type" -> JString(changeType),
    "message_list" -> JArray(messageList.map(JString)),
    "output_location" -> JString(outputLocation),
    "has_error" -> JBool(hasError))))
}

/** Entry point replacing the Lambda handler chain (A1-A4, A10, A22):
  * load table-def JSON → validate → create or evolve → persist the
  * response JSON under `<warehouse>/_output/<uuid>.json`.
  */
object Engine {

  def processTableDefFile(warehouse: String, path: String): ProcessSchemaResponse = {
    val json =
      try Files.readString(Paths.get(path))
      catch {
        case e: Exception =>
          return saveOutput(warehouse, ProcessSchemaResponse("", "", "TBD",
            Seq(s"Failed to load table definition $path: ${e.getMessage}"),
            "", hasError = true))
      }
    processTableDefJson(warehouse, json)
  }

  def processTableDefJson(warehouse: String, json: String): ProcessSchemaResponse = {
    TableDef.parse(json) match {
      case Left(errors) =>
        saveOutput(warehouse, ProcessSchemaResponse("", "", "TBD",
          "Table definition failed validation:" +: errors, "", hasError = true))
      case Right(td) =>
        val resp =
          try {
            if (LakeTable.exists(warehouse, td.databaseName, td.tableName)) {
              val t = LakeTable.load(warehouse, td.databaseName, td.tableName)
              val (messages, hadError) = t.evolve(td)
              ProcessSchemaResponse(td.databaseName, td.tableName,
                "ALTER TABLE", messages, "", hadError)
            } else {
              val (_, messages) = LakeTable.create(warehouse, td)
              ProcessSchemaResponse(td.databaseName, td.tableName,
                "CREATE TABLE", messages, "", hasError = false)
            }
          } catch {
            case e: Exception =>
              ProcessSchemaResponse(td.databaseName, td.tableName, "TBD",
                Seq(s"Processing failed: ${e.getMessage}"), "", hasError = true)
          }
        saveOutput(warehouse, resp)
    }
  }

  private def saveOutput(warehouse: String,
      resp: ProcessSchemaResponse): ProcessSchemaResponse = {
    try {
      val outDir = Paths.get(warehouse, "_output")
      Files.createDirectories(outDir)
      val loc = outDir.resolve(s"${java.util.UUID.randomUUID()}.json")
      val withLoc = resp.copy(outputLocation = loc.toString)
      Files.writeString(loc, withLoc.toJsonString)
      withLoc
    } catch {
      case e: Exception =>
        resp.copy(hasError = true,
          messageList = resp.messageList :+ s"Failed to save output: ${e.getMessage}")
    }
  }
}
