package graft.schema

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema-evolution policy: the stored schema is the union over time of all
  * observed schemas; brand-new columns widen the table, and columns missing
  * from a batch are null-filled.
  *
  * Re-expresses the reference's `evolveSchema`
  * (glue-streaming-job-script/glue_job_script.py:81-94): the reference
  * compares the incoming batch schema against a zero-row projection of the
  * catalog table (minus system columns) and, when they differ, runs
  * `unionByName(..., allowMissingColumns=True)`. We implement the *intent*
  * directly — `if schemas differ → union else passthrough` — fixing the
  * reference's accidental unbound-variable path (glue_job_script.py:89-91,
  * where equal schemas raise NameError and are rescued by the bootstrap
  * `except`).
  */
object SchemaEvolution {

  /** System/meta columns excluded from the user-facing schema, mirroring the
    * five Hudi meta columns the reference strips before comparing schemas
    * (glue_job_script.py:87-88).
    */
  val SystemColumnPrefix = "_graft_"

  def dropSystemColumns(df: DataFrame): DataFrame =
    df.drop(df.columns.filter(_.startsWith(SystemColumnPrefix)).toIndexedSeq: _*)

  def isSystemColumn(name: String): Boolean = name.startsWith(SystemColumnPrefix)

  /** Structural schema comparison — order- and type-sensitive, like the
    * reference's `kinesis_df.schema != glue_catalog_df.schema`
    * (glue_job_script.py:89). Nullability is deliberately ignored: a
    * null-filled column produced by a previous evolution round must compare
    * equal to its originally non-nullable form.
    */
  def differs(a: StructType, b: StructType): Boolean =
    a.fields.map(f => (f.name, f.dataType)).toSeq !=
      b.fields.map(f => (f.name, f.dataType)).toSeq

  /** Zero-row DataFrame carrying `schema` — the engine's equivalent of the
    * reference's `SELECT * FROM tbl LIMIT 0` catalog probe
    * (glue_job_script.py:85); Catalyst collapses it to metadata.
    */
  def emptyOf(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(new java.util.ArrayList[Row](), schema)

  /** Align `batch` to the union of its own schema and `current`:
    * columns present only in `current` are null-filled; columns present only
    * in `batch` widen the output schema (glue_job_script.py:90).
    * Row count is exactly `batch`'s (the other side contributes zero rows).
    */
  def align(batch: DataFrame, current: StructType): DataFrame =
    if (!differs(batch.schema, current)) batch
    else
      batch.unionByName(
        emptyOf(batch.sparkSession, current),
        allowMissingColumns = true)

  /** Bootstrap-aware alignment: when no current schema exists (first ever
    * batch — the reference's try/except at glue_job_script.py:92-94), the
    * batch passes through unchanged and its schema becomes the table schema.
    */
  def align(batch: DataFrame, current: Option[StructType]): DataFrame =
    current.fold(batch)(align(batch, _))
}
