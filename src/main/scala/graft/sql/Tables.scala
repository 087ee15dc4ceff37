package graft.sql

import org.apache.spark.sql.SparkSession

/** SQL surface: register the testdata tables as temp views so the whole
  * engine is reachable through `spark.sql(...)` — including the native
  * functions when the session carries GraftExtensions (or after
  * VectorFunctions.ensureRegistered).
  */
object Tables {
  val Names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def register(spark: SparkSession, dir: String): Unit =
    Names.foreach { n =>
      graft.table(spark, dir, n).createOrReplaceTempView(n)
    }
}
