package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Every operator takes the sf directory as a parameter so the same
  * plan runs unchanged from sf0.001 (6k lineitem rows) to a
  * 100 TB lake — the scan is a plain parquet V2 scan, so column
  * pruning and predicate pushdown reach the reader for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  /** Some generations of events.parquet store TIMESTAMP(NANOS), which
    * Spark has no native type for: with nanosAsLong those read as LONG
    * and are integer-divided down to micros (`div`, not `/` — a double
    * round-trip would lose precision above 2^53 ns; the source data is
    * microsecond-aligned so this is exact). Newer generations store
    * TIMESTAMP(MICROS), which arrives as a native timestamp — detect
    * from the loaded schema rather than assuming either layout.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // session tz is UTC, so NTZ wall-clock → the same instants the
        // nanos layout produced; unix_micros & co. need TimestampType
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  /** Generation-adaptive loaders for the other two non-TPC-H tables —
    * the same defensive posture the events loader earned in round 5
    * (the driver regenerates testdata between rounds and physical
    * types have changed before). Each normalization is CONDITIONAL: on
    * today's layout it is the identity, so plans (and filter pushdown
    * on `label`) are untouched.
    */
  def documents(spark: SparkSession, dir: String): DataFrame = {
    val df = load(spark, dir, "documents")
    df.schema("n_chars").dataType match {
      case org.apache.spark.sql.types.IntegerType =>
        df.withColumn("n_chars",
          org.apache.spark.sql.functions.col("n_chars")
            .cast(org.apache.spark.sql.types.LongType))
      case _ => df
    }
  }
  def embeddings(spark: SparkSession, dir: String): DataFrame = {
    val df = load(spark, dir, "embeddings")
    df.schema("label").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // Narrowing is the non-widening (unsafe) direction: guard the
        // cast so a regenerated dataset with labels outside Int range
        // fails LOUDLY (raise_error) instead of silently wrapping under
        // the non-ANSI cast. On in-range data the branch folds to the
        // plain value and the cast behaves as before.
        val f = org.apache.spark.sql.functions
        val label = f.col("label")
        // NULL passes through explicitly: between() yields NULL on a
        // null label, which would otherwise fall into the raise_error
        // branch with a NULL concat message — a hard fail with an
        // opaque error where the old plain cast passed null through.
        df.withColumn("label",
          f.when(label.isNull, f.lit(null))
            .when(label.between(Int.MinValue.toLong, Int.MaxValue.toLong), label)
            .otherwise(f.raise_error(f.concat(
              f.lit("embeddings.label out of Int range: "),
              f.coalesce(label.cast("string"), f.lit("null")))))
            .cast(org.apache.spark.sql.types.IntegerType))
      case _ => df
    }
  }

  /** `events` as an unbounded file-source stream (the production
    * ingestion path: drop parquet files into a directory, Spark streams
    * them). Same nanos→micros normalization as the batch loader, so the
    * streaming plans are drop-in twins of the batch ones.
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = load(spark, dir, "events").schema
    val df = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    // same generation-adaptive ts normalization as [[events]]
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
}
