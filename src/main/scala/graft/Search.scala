package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.rank.BM25
import graft.sources.Sources

/** `search.sh` parity (app/search.sh -> app/query.py): rank a query
  * against an EXISTING stored index — no rebuild, the serving path only.
  * The reference prints `doc_id<TAB>title<TAB>score`; we emit the ranked
  * frame and a TSV copy. */
object Search {

  def run(spark: SparkSession, indexDir: String, query: String,
          topK: Int = 10): DataFrame =
    BM25.searchStored(spark, indexDir, query, topK = topK)

  /** CLI: <indexDir> <query words...> */
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Search <indexDir> <query words...>")
    val indexDir = args(0)
    val query = args.drop(1).mkString(" ")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val result = run(spark, indexDir, query)
    Sources.writeTsv(result, s"$indexDir/last_search")
    result.show(truncate = false)
    spark.stop()
  }
}
