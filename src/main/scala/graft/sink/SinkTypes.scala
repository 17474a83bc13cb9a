package graft.sink

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField, StructType}

/** Sink-type column metadata (reference P10): the reference annotates its
  * projection with warehouse DDL types —
  * `alias(name, metadata={'redshift_type': 'SUPER'})`,
  * reference src/glue_pg_redshift_cdc.py:139-145 and
  * src/glue_docdb_redshift_cdc.py:141-147 — so the JSON payload lands as
  * Redshift SUPER and keys/markers get proper VARCHAR/CHAR widths.
  * Spark's equivalent is `Column.as(alias, Metadata)` (SURVEY §1.2);
  * metadata travels with the schema through selects/drops and is read
  * back by [[MergeDialect.columnDdl]] when the stage table is created.
  */
object SinkTypes {

  /** The metadata key, matching the reference's literal. */
  val Key = "redshift_type"

  def metadataFor(ddlType: String): Metadata =
    new MetadataBuilder().putString(Key, ddlType).build()

  /** `col.as(alias)` carrying a warehouse DDL type. */
  def as(c: Column, alias: String, ddlType: String): Column =
    c.as(alias, metadataFor(ddlType))

  /** The annotated DDL type of a field, if any. */
  def of(f: StructField): Option[String] =
    if (f.metadata.contains(Key)) Some(f.metadata.getString(Key)) else None

  def hasAny(schema: StructType): Boolean =
    schema.fields.exists(_.metadata.contains(Key))

  /** Spark cast target for a numeric warehouse DDL type (either the
    * Redshift alias or the translated standard name), None for
    * non-numeric DDL. Used to keep row-wise JDBC binds type-compatible
    * with numerically-annotated stage columns.
    */
  def numericSparkType(ddl: String): Option[String] = ddl.trim.toUpperCase match {
    case "INT4" | "INTEGER" | "INT" => Some("int")
    case "INT8" | "BIGINT" => Some("long")
    case "INT2" | "SMALLINT" => Some("short")
    case "FLOAT8" | "DOUBLE PRECISION" => Some("double")
    case "FLOAT4" | "REAL" => Some("float")
    case _ => None
  }

  /** Re-alias the named columns with their sink types (identity when the
    * map is empty). Applied by the pipeline between compaction and the
    * sink, mirroring the reference's annotated projection.
    */
  def annotate(df: DataFrame, types: Map[String, String]): DataFrame =
    if (types.isEmpty) df
    else df.select(df.columns.map { c =>
      types.get(c).fold(col(c))(t => as(col(c), c, t))
    }.toSeq: _*)
}
