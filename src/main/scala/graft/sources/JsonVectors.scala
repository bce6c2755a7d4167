package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** Bulk ingestion of the reference engine's JSON wire format
  * (reference: src/models/request/insert.rs — {id, vectors[, data]};
  * upsert.rs carries `data` as an arbitrary JSON value) from
  * newline-delimited JSON files — the path a user migrating off the
  * HTTP service uses to replay captured insert/upsert payloads into
  * the Spark engine at bulk speed.
  *
  * Lines parse as text + JSON-path extraction rather than a fixed
  * Spark JSON schema so `data` survives as its RAW json text whether
  * the payload wrote it as an object or a string — matching the
  * reference's serde_json::Value passthrough into scalar storage.
  * Malformed lines (unparsable id/vectors) surface as `_corrupt = true`
  * rows rather than vanishing, the batch analog of the reference's
  * per-request 400.
  */
object JsonVectors {

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .where(length(trim(col("value"))) > 0)
      .select(
        get_json_object(col("value"), "$.id").cast("long").as("id"),
        from_json(get_json_object(col("value"), "$.vectors"), ArrayType(FloatType))
          .as("vectors"),
        get_json_object(col("value"), "$.data").as("data"))
      .withColumn("_corrupt", col("id").isNull || col("vectors").isNull)

  /** Valid rows only, in the (id, vectors, data) shape
    * [[graft.api.VectorIndex.insertAll]] and upsertAll accept.
    */
  def readValid(spark: SparkSession, path: String): DataFrame =
    read(spark, path).where(!col("_corrupt")).drop("_corrupt")
}
