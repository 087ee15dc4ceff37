package graft

import org.apache.spark.sql.SparkSession

/** Shared session bootstrap for the CLI entry points (Pipeline / Search /
  * Ingest) — one place for the local-mode config, cores env-driven the
  * same way Bench's are. */
object Cli {
  def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
