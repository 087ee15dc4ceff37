package object graft {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.functions._

  /** Load one harness testdata table (TESTDATA.md) from an sf directory.
    *
    * `events.parquet` stores ts as parquet TIMESTAMP(NANOS), which Spark's
    * reader rejects ([PARQUET_TYPE_ILLEGAL]); read it as raw nanos via the
    * legacy conf and convert with exact integer division. The raw nanos DO
    * carry sub-microsecond components (e.g. ...938 ns at sf0.1); `div 1000`
    * truncates to micros exactly like DuckDB's TIMESTAMP(NANOS)->TIMESTAMP
    * read on the oracle side, so the truncation is parity-exact, not lossy
    * bookkeeping.
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
      val raw = spark.read.parquet(s"$dir/events.parquet")
      // Normalize ts across writer spellings — a user's events table is
      // any of these depending on what produced the file:
      //  - INT64 nanos / TIMESTAMP(NANOS) (the harness testdata): exact
      //    integer div to micros, same truncation DuckDB applies reading
      //    NANOS as TIMESTAMP on the oracle side;
      //  - TIMESTAMP_NTZ (e.g. DuckDB-written micros): under the session's
      //    pinned UTC, the cast keeps the wall time — same instant;
      //  - TIMESTAMP: already the canonical type.
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast("timestamp"))
        case _ => raw
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
}
