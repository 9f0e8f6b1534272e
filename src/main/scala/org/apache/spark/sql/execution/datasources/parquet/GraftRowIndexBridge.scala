package org.apache.spark.sql.execution.datasources.parquet

/** Bridge to the parquet row-index machinery (Scala-private in the
  * Spark jar, public in bytecode — the same seam technique as
  * [[org.apache.spark.sql.GraftPlanBridge]]): the temporary column
  * name Spark's vectorized parquet reader recognizes
  * (`ParquetRowIndexUtil.findRowIndexColumnIndexInSchema`) and fills
  * with FILE-ABSOLUTE row indexes generated from
  * `PageReadStore.getRowIndexes()` — exact under row-group skipping,
  * page-index (column-index) filtering, and byte-range splits. The
  * graft-lake readers request this column on position-consuming
  * merge-on-read scans so position-delete / deletion-vector probes,
  * `_graft_pos`, and row-lineage inheritance read true physical
  * positions with predicate pushdown ENGAGED, instead of a sequential
  * counter that forced pushdown off.
  */
object GraftRowIndexBridge {
  val RowIndexTempCol: String =
    ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME
}
