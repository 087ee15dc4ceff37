package graft

import org.apache.spark.sql.SparkSession
import graft.index.IndexStore
import graft.sources.Sources

/** `index.sh <path>` parity (app/index.sh:11-41): take ONE local text
  * file, apply the reference's conventions (title from filename, newlines
  * flattened), and fold it into an existing stored index incrementally —
  * stored stats merge, nothing re-tokenizes the old corpus. */
object Ingest {

  def run(spark: SparkSession, indexDir: String, path: String,
          docId: Long): Unit =
    IndexStore.ingest(Sources.ingestLocalFile(spark, path, docId), indexDir)

  /** CLI: <indexDir> <file.txt> [docId]. The reference draws a random
    * 6-digit id (app/index.sh:23); default here is a content-derived one —
    * deterministic, and the ingest dup-guard rejects a genuine collision
    * loudly instead of corrupting stats. */
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Ingest <indexDir> <file.txt> [docId]")
    val indexDir = args(0)
    val path = args(1)
    val spark = Cli.session()
    val docId =
      if (args.length >= 3) args(2).toLong
      else 100000L + math.floorMod(
        scala.util.hashing.MurmurHash3.stringHash(
          new java.io.File(path).getName), 900000)
    run(spark, indexDir, path, docId)
    println(s"ingested $path as doc_id=$docId into $indexDir")
    spark.stop()
  }
}
