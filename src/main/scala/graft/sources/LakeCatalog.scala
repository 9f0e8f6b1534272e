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
  * The full SQL lifecycle routes through the engine's own machinery:
  * CREATE TABLE / CTAS and ALTER TABLE (add/drop/retype top-level
  * columns) convert to the TableDef contract — identical field-ID
  * assignment and evolution semantics as a JSON definition — and
  * DROP TABLE removes the table directory. RENAME and nested ALTERs
  * stay on the table-def path.
  */
class LakeCatalog extends TableCatalog
    with org.apache.spark.sql.connector.catalog.FunctionCatalog {

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
    new LakeSparkTable(warehouse, db, tbl, 0L, t)
  }

  /** SQL time travel: SELECT … FROM graft.db.t VERSION AS OF <snapshot>. */
  override def loadTable(ident: Identifier, version: String): Table = {
    require(ident.namespace.length == 1, "expected <database>.<table>")
    val (db, tbl) = (ident.namespace()(0), ident.name)
    if (!LakeTable.exists(warehouse, db, tbl))
      throw new NoSuchTableException(ident)
    val sid = try version.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"graft catalog: VERSION AS OF takes a numeric snapshot id, " +
          s"got '$version' for $ident")
    }
    val t = LakeTable.load(warehouse, db, tbl)
    t.schemaAsOf(sid) // validate the pin before handing out the table
    new LakeSparkTable(warehouse, db, tbl, 0L, t, Some(sid))
  }

  /** CREATE TABLE / CTAS: the SQL schema and partition transforms are
    * converted into the engine's TableDef contract (same field-ID
    * assignment, spec build, metadata commit as a JSON definition).
    */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    require(ident.namespace.length == 1, "expected <database>.<table>")
    val (db, tbl) = (ident.namespace()(0), ident.name)
    val cols = schema.fields.toSeq.map(f =>
      graft.schema.TypeMapper.toColumnDef(f.name, f.dataType, f.nullable))
    val parts = partitions.toSeq.map { t =>
      val ref = t.references()(0).fieldNames()
      require(ref.length == 1,
        s"partition reference '${ref.mkString(".")}' must be a top-level " +
          "column (nested references would bind to the struct)")
      val colName = ref(0)
      val (transform, name) = t.name match {
        case "identity" => ("identity", s"${colName}_identity")
        case "years" => ("year", s"${colName}_year")
        case "months" => ("month", s"${colName}_month")
        case "days" => ("day", s"${colName}_day")
        case "hours" => ("hour", s"${colName}_hour")
        case "bucket" =>
          // PARTITIONED BY (bucket(N, col)): the literal arg is N
          val n = t.arguments.collectFirst {
            case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
              l.value.toString.toInt
          }.getOrElse(throw new IllegalArgumentException(
            "bucket transform needs a literal bucket count"))
          (s"bucket[$n]", s"${colName}_bucket_$n")
        case other => throw new UnsupportedOperationException(
          s"partition transform '$other' not supported (identity/" +
            "years/months/days/hours/bucket)")
      }
      graft.schema.PartitionDef(colName, transform, name)
    }
    val props = properties.asScala.toMap -
      "owner" - "provider" // Spark-injected bookkeeping keys
    LakeTable.create(warehouse, graft.schema.TableDef(
      db, tbl, cols, parts, props))
    loadTable(ident)
  }

  /** ALTER TABLE: add/drop/retype columns map onto the engine's
    * evolution diff (same field-ID carry-over as a new JSON
    * definition). Renames are unsupported — the diff is name-based.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    require(ident.namespace.length == 1, "expected <database>.<table>")
    val t = LakeTable.load(warehouse, ident.namespace()(0), ident.name)
    var cols = t.currentSchema.fields.toSeq.map(f =>
      graft.schema.TypeMapper.toColumnDef(f.name, f.dataType, f.nullable))
    changes.foreach {
      case a: TableChange.AddColumn =>
        require(a.fieldNames.length == 1,
          "ALTER ADD nested columns: use a table-def evolution")
        cols = cols :+ graft.schema.TypeMapper.toColumnDef(
          a.fieldNames()(0), a.dataType, a.isNullable)
      case d: TableChange.DeleteColumn =>
        require(d.fieldNames.length == 1,
          "ALTER DROP nested columns: use a table-def evolution")
        cols = cols.filterNot(_.name == d.fieldNames()(0))
      case u: TableChange.UpdateColumnType =>
        require(u.fieldNames.length == 1,
          "ALTER nested columns: use a table-def evolution")
        cols = cols.map(c => if (c.name == u.fieldNames()(0))
          graft.schema.TypeMapper.toColumnDef(c.name, u.newDataType,
            !c.required)
          else c)
      case other => throw new UnsupportedOperationException(
        s"graft catalog: unsupported ALTER ${other.getClass.getSimpleName}" +
          " (add/drop/retype top-level columns only)")
    }
    val spec = t.metadata.currentSpec.fields.map { f =>
      val src = graft.schema.FieldIds.flatten(t.currentSchema)
        .collectFirst { case (p, fd)
          if graft.schema.FieldIds.idOf(fd) == f.sourceFieldId => p }.get
      graft.schema.PartitionDef(src, f.transform, f.name)
    }
    val (msgs, hadError) = t.evolve(graft.schema.TableDef(
      ident.namespace()(0), ident.name, cols, spec, t.metadata.properties))
    if (hadError) throw new IllegalArgumentException(
      s"ALTER rejected: ${msgs.mkString("; ")}")
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    require(ident.namespace.length == 1, "expected <database>.<table>")
    val loc = LakeTable.tableLocation(warehouse, ident.namespace()(0),
      ident.name)
    if (!Files.exists(loc)) return false
    scala.util.Using.resource(Files.walk(loc)) { st =>
      st.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    }
    true
  }

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = throw new UnsupportedOperationException(
    "graft catalog: RENAME not supported (metadata records identity)")

  // ---- FunctionCatalog: partition-transform functions -----------------
  // Spark resolves a scan's reported years(ts)/months(ts)/… clustering
  // through the table's catalog — serving these enables storage-
  // partitioned joins on time-partitioned lake tables.

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty)
      LakeFunctions.names.map(n =>
        Identifier.of(Array.empty[String], n)).toArray
    else Array.empty

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.namespace.isEmpty && LakeFunctions.names.contains(ident.name))
      LakeFunctions.unbound(ident.name)
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(ident)
}
