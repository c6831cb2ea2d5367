package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Multi-format lake IO: the same DataFrame round-trips through
  * parquet, json, or csv with schema fidelity. Parquet is the
  * performance path (columnar, predicate pushdown, column pruning);
  * json/csv exist because a lake ingests what it's given — both are
  * read with an EXPLICIT schema (never inferSchema: schema inference
  * reads the data twice and types drift run-to-run, a correctness
  * hazard the reference's zod-validated parsing exists to prevent).
  *
  * CSV carries only flat scalar schemas — callers project
  * array/struct columns away first (asserted, not silently mangled).
  */
object Formats {
  val Supported = Set("parquet", "json", "csv")

  def write(df: DataFrame, dir: String, format: String,
    partitionCols: Seq[String] = Nil): Unit = {
    require(Supported(format), s"unsupported format $format")
    if (format == "csv") requireFlat(df.schema)
    val w = df.write.mode("overwrite").format(format)
    val w2 = if (format == "csv") w.option("header", "true") else w
    (if (partitionCols.nonEmpty) w2.partitionBy(partitionCols: _*) else w2).save(dir)
  }

  def read(spark: SparkSession, dir: String, format: String,
    schema: StructType): DataFrame = {
    require(Supported(format), s"unsupported format $format")
    val r = spark.read.format(format).schema(schema)
    (if (format == "csv") r.option("header", "true") else r).load(dir)
  }

  private def requireFlat(schema: StructType): Unit =
    schema.fields.foreach { f =>
      require(!f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] &&
        !f.dataType.isInstanceOf[StructType] &&
        !f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType],
        s"csv cannot carry nested column '${f.name}: ${f.dataType.simpleString}' — project it away first")
    }
}
