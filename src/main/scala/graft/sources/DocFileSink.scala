package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Per-document file materialization (S7 — app/prepare_data.py:20-26 runs
  * `df.foreach(create_doc)` writing one `{id}_{sanitized title}.txt` per
  * row; T5 — the `sanitize_filename(...).replace(" ", "_")` step at
  * app/prepare_data.py:21).
  *
  * Side-effect sink, so no SQL oracle — covered by the DocFileSinkSpec
  * round-trip. `foreachPartition` (not `foreach`) amortizes any per-task
  * setup and keeps the write loop executor-local: rows never visit the
  * driver. Like the reference (which only works because it runs Spark in
  * local mode), files land on the filesystem of whichever executor runs
  * the partition — on a real cluster point `outDir` at a shared mount, or
  * prefer a single distributed write (`Sources.writeTsv`) and fan out to
  * files at the consumer.
  */
object DocFileSink {

  /** T5: keep [A-Za-z0-9._-], replace everything else (spaces included)
    * with '_' — a strict superset of the reference's sanitize+replace. */
  def sanitizeFilename(c: Column): Column =
    regexp_replace(c, "[^A-Za-z0-9._-]+", "_")

  /** Write one UTF-8 `.txt` file per row named `{id}_{sanitized title}.txt`.
    * Expects columns (doc_id, doc_title, text); extra columns are ignored.
    * Collisions after sanitization overwrite (reference behavior). */
  def writeDocFiles(docs: DataFrame, outDir: String): Unit = {
    val rows = docs.select(
      col("doc_id").cast("string").as("doc_id"),
      sanitizeFilename(col("doc_title")).as("fname"),
      col("text"))
    rows.foreachPartition { it: Iterator[Row] =>
      val dir = Paths.get(outDir)
      Files.createDirectories(dir)
      it.foreach { r =>
        val name = r.getString(0) + "_" + r.getString(1) + ".txt"
        Files.write(dir.resolve(name),
          r.getString(2).getBytes(StandardCharsets.UTF_8))
      }
    }
  }
}
