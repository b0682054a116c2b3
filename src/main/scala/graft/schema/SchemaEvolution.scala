package graft.schema

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

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
  *
  * The reference's `forcecast` flag (`evolveSchema(..., forcecast=False)`,
  * glue_job_script.py:82) is accepted but never used by its body — there
  * is no behavior to reproduce, so it is intentionally unimplemented here;
  * its plausible intent (coerce drifted column types instead of failing)
  * is what [[widenType]]/[[align]] provide.
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

  /** Type-drift policy for a column present on BOTH sides with different
    * types — the batch-path analogue of DynamicFrame choice types
    * (glue_job_script.py:100-106): JSON numeric inference drifts int→long→
    * double between batches, and a plain `unionByName` would throw.
    * Numerics widen within the safe lattice (wider integral; any
    * fractional mix → double — long→float would silently lose precision).
    *
    * Containers recurse instead of collapsing: a drifted LEAF inside a
    * struct/array/map — exactly what JSON inference produces for nested
    * records (glue_job_script.py:42) — widens that leaf and keeps the
    * container shape, provided the shapes agree (structs: same field names
    * in the same order, so the struct-to-struct cast in [[align]] stays
    * positionally sound). Shape drift (a nested field added or removed)
    * and every other conflict fall back to string, the same lossless
    * token representation `JsonStreamSource.widenToChoiceSchema` uses, to
    * be resolved per-consumer via `resolveChoice`.
    */
  def widenType(a: DataType, b: DataType): DataType = {
    val rank: Map[DataType, Int] = Map(
      ByteType -> 0, ShortType -> 1, IntegerType -> 2, LongType -> 3,
      FloatType -> 4, DoubleType -> 5)
    (a, b) match {
      case (x, y) if x == y => x
      case (StructType(af), StructType(bf))
          if af.length == bf.length &&
            af.map(_.name).sameElements(bf.map(_.name)) =>
        StructType(af.zip(bf).map { case (fa, fb) =>
          StructField(fa.name, widenType(fa.dataType, fb.dataType), nullable = true)
        })
      case (ArrayType(ae, an), ArrayType(be, bn)) =>
        ArrayType(widenType(ae, be), an || bn)
      case (MapType(ak, av, an), MapType(bk, bv, bn)) =>
        MapType(widenType(ak, bk), widenType(av, bv), an || bn)
      case _ =>
        (rank.get(a), rank.get(b)) match {
          case (Some(ra), Some(rb)) if ra <= 3 && rb <= 3 => if (ra > rb) a else b
          case (Some(_), Some(_))                         => DoubleType
          case _                                          => StringType
        }
    }
  }

  /** Align `batch` to the union of its own schema and `current`:
    * columns present only in `current` are null-filled; columns present only
    * in `batch` widen the output schema (glue_job_script.py:90); columns on
    * both sides whose types drifted are cast to [[widenType]] so the union
    * resolves instead of throwing. Row count is exactly `batch`'s (the
    * other side contributes zero rows).
    */
  def align(batch: DataFrame, current: StructType): DataFrame =
    if (!differs(batch.schema, current)) batch
    else {
      val currentTypes = current.fields.map(f => f.name -> f.dataType).toMap
      val castBatch = batch.schema.fields.foldLeft(batch) { (df, f) =>
        currentTypes.get(f.name) match {
          case Some(t) if t != f.dataType =>
            df.withColumn(f.name, col(f.name).cast(widenType(f.dataType, t)))
          case _ => df
        }
      }
      val batchTypes = batch.schema.fields.map(f => f.name -> f.dataType).toMap
      val widenedCurrent = StructType(current.fields.map { f =>
        batchTypes.get(f.name) match {
          case Some(t) if t != f.dataType =>
            f.copy(dataType = widenType(t, f.dataType))
          case _ => f
        }
      })
      castBatch.unionByName(
        emptyOf(batch.sparkSession, widenedCurrent),
        allowMissingColumns = true)
    }

  /** Bootstrap-aware alignment: when no current schema exists (first ever
    * batch — the reference's try/except at glue_job_script.py:92-94), the
    * batch passes through unchanged and its schema becomes the table schema.
    */
  def align(batch: DataFrame, current: Option[StructType]): DataFrame =
    current.fold(batch)(align(batch, _))

  /** Reconstruct a batch's OWN schema under a fixed-schema decode: a
    * schema-on-read transport (the reference's per-batch DynamicFrame,
    * glue_job_script.py:99-103) hands each micro-batch only the fields its
    * records actually carry, but Structured Streaming fixes the source
    * schema at stream start and null-fills fields absent from every record
    * of a batch. Dropping columns with zero non-null values recovers the
    * per-batch schema, so the evolution union sees each batch the way the
    * reference's loop does — a table bootstrapped before a column existed
    * is created WITHOUT it and widens when the column first appears.
    *
    * Cost: one bounded aggregate pass per micro-batch — O(batch), never
    * O(table). A field explicitly `null` in every record of a batch is
    * indistinguishable from an absent one after decode; either way the
    * rows read back null, so the merge result is unaffected.
    */
  def dropAbsentColumns(batch: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.count
    val counts = batch
      .select(batch.columns.map(c => count(col(c)).as(c)).toIndexedSeq: _*)
      .head()
    val absent = batch.columns.zipWithIndex
      .collect { case (c, i) if counts.getLong(i) == 0L => c }
    if (absent.isEmpty) batch else batch.drop(absent.toIndexedSeq: _*)
  }
}
