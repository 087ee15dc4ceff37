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
      val key = "spark.sql.legacy.parquet.nanosAsLong"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "true")
      try {
        spark.read.parquet(s"$dir/events.parquet")
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      } finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
}
