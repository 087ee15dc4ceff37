package object graft {
  import org.apache.spark.sql.{DataFrame, SparkSession}

  /** Load one harness testdata table (TESTDATA.md) from an sf directory. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
