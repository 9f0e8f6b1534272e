package graft
import org.apache.spark.sql.SparkSession

/** Dev probe 2: FileFormatWriter overhead vs a bare per-task parquet
  * write of the same rows. tools/run.sh graft.WriteProbe2 <sfdir> */
object WriteProbe2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = graft.queries.QueryModule.microSession(spark, 4)
    spark.range(100).selectExpr("sum(id)").collect()
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $name%-30s ${(System.nanoTime()-t0)/1e6}%8.1f ms"); r
    }
    val src = graft.queries.Tables(s, dir, "orders").select(
      "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
    val schema = src.schema
    for (round <- 1 to 3) {
      println(s"=== round $round")
      val d1 = java.nio.file.Files.createTempDirectory("wq1").toString
      t("dfwriter parquet") { src.write.mode("overwrite").parquet(d1) }
      val d2 = java.nio.file.Files.createTempDirectory("wq2").toString
      t("bare rdd parquet") {
        import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
        import org.apache.spark.sql.internal.SQLConf
        import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
        import org.apache.hadoop.mapreduce.TaskType
        val rdd = src.queryExecution.toRdd
        val paths = rdd.mapPartitionsWithIndex { (i, it) =>
          if (!it.hasNext) Iterator.empty
          else {
            val conf = graft.lake.HadoopConfs.mutable()
            ParquetWriteSupport.setSchema(schema, conf)
            conf.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key, "false")
            conf.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key, "TIMESTAMP_MICROS")
            conf.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key, "true")
            conf.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key, "false")
            conf.set(SQLConf.LEGACY_PARQUET_NANOS_AS_LONG.key, "false")
            conf.set(SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED.key, "true")
            conf.set(SQLConf.CASE_SENSITIVE.key, "false")
            val ctx = new TaskAttemptContextImpl(conf,
              new org.apache.hadoop.mapreduce.TaskAttemptID(
                "graft", 0, TaskType.MAP, i, 0))
            val fmt = new org.apache.parquet.hadoop
              .ParquetOutputFormat[org.apache.spark.sql.catalyst.InternalRow](
              new ParquetWriteSupport())
            val p = s"$d2/part-$i.parquet"
            val w = fmt.getRecordWriter(ctx.getConfiguration,
              new org.apache.hadoop.fs.Path(p),
              org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
            it.foreach(r => w.write(null, r))
            w.close(ctx)
            Iterator.single(p)
          }
        }.collect()
        require(paths.nonEmpty)
      }
    }
    spark.stop()
  }
}
