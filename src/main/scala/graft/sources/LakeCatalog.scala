package graft.sources

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.lake.LakeTable

/** Catalog plugin exposing the warehouse to SQL:
  *
  *   spark.sql.catalog.graft           = graft.sources.LakeCatalog
  *   spark.sql.catalog.graft.warehouse = /path/to/warehouse
  *   SELECT * FROM graft.customer_order.orders
  *
  * Read-only by design: DDL flows through the engine's table-def
  * contract (`Engine.processTableDef*`, the reference's A10/A11
  * surface), not through SQL CREATE/ALTER — the catalog surfaces every
  * table for query access via the DSv2 reader (batch + streaming).
  */
class LakeCatalog extends TableCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name: set spark.sql.catalog.$name.warehouse"))
  }

  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    require(namespace.length == 1, "expected <database> namespace")
    val db = Paths.get(warehouse, namespace(0))
    if (!Files.isDirectory(db)) throw new NoSuchNamespaceException(namespace)
    scala.util.Using.resource(Files.list(db)) { st =>
      st.iterator().asScala
        .filter(p => LakeTable.exists(warehouse, namespace(0),
          p.getFileName.toString))
        .map(p => Identifier.of(namespace, p.getFileName.toString))
        .toArray
    }
  }

  override def loadTable(ident: Identifier): Table = {
    require(ident.namespace.length == 1, "expected <database>.<table>")
    val (db, tbl) = (ident.namespace()(0), ident.name)
    if (!LakeTable.exists(warehouse, db, tbl))
      throw new NoSuchTableException(ident)
    val t = LakeTable.load(warehouse, db, tbl)
    LakeSource.requireSupported(t.currentSchema)
    new LakeSparkTable(warehouse, db, tbl, 0L, t)
  }

  private def readOnly = new UnsupportedOperationException(
    "graft catalog is read-only: run DDL through the table-def engine " +
      "(Engine.processTableDefJson/File)")

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = throw readOnly
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = throw readOnly
  override def dropTable(ident: Identifier): Boolean = throw readOnly
  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = throw readOnly
}
