package object graft {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.functions._

  /** Load one harness testdata table (TESTDATA.md) from an sf directory.
    *
    * `events.parquet` stores ts as parquet TIMESTAMP(NANOS), which Spark's
    * reader rejects ([PARQUET_TYPE_ILLEGAL]); read it as raw nanos via the
    * legacy conf and convert with exact integer division (the testdata has
    * no sub-microsecond components, verified ns%1000==0 across all rows).
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // The conf must still be set when the scan's schema is resolved —
      // which for a lazy DataFrame can be ANY later action — so it is set
      // for the session and deliberately NOT restored: a set/unset dance
      // around the read call races concurrent readers and can flip the
      // conf back before resolution happens. nanosAsLong only affects
      // TIMESTAMP(NANOS) parquet columns, which exist solely in `events`.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
}
