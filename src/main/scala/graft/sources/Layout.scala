package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-layout control for written tables — the two operational levers a
  * 100 TB parquet estate depends on:
  *
  *  - **File-skipping**: range-sorting on the access keys clusters values,
  *    so parquet footer min/max statistics let a selective scan skip whole
  *    files (and row groups within them) instead of reading everything.
  *  - **File sizing**: an explicit output file count prevents the
  *    small-files problem (a table of 100k tiny files bottlenecks the
  *    driver and the metadata layer long before IO does) and its inverse
  *    (one giant file caps scan parallelism).
  *
  * The sort is `repartitionByRange` + `sortWithinPartitions`: ONE range
  * exchange (sampled boundaries), then p independent in-partition sorts —
  * never a global single-node sort. Equal keys land in one partition, so
  * per-file key ranges are disjoint (LayoutSpec pins this from the actual
  * footers of a written table).
  */
object Layout {

  /** Write `df` as `numFiles` range-sorted parquet files on `sortCols`. */
  def writeSorted(df: DataFrame, dir: String, sortCols: Seq[String],
                  numFiles: Int): Unit = {
    require(sortCols.nonEmpty && numFiles >= 1)
    df.repartitionByRange(numFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").parquet(dir)
  }

  /** Compact an existing parquet directory to `numFiles` range-sorted
    * files — the maintenance pass that undoes incremental-append
    * fragmentation (e.g. a streaming sink's per-batch files). The swap
    * goes through AtomicStore's two-rename protocol: at every instant a
    * complete copy exists (a delete-then-rename spelling would leave NO
    * table if the process died in between — round-3 review). */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String,
              sortCols: Seq[String], numFiles: Int): Unit = {
    val f = new java.io.File(dir)
    val p = AtomicStore.paths(f.getParent, f.getName)
    val src = AtomicStore.live(p).getOrElse(
      throw new IllegalArgumentException(s"Layout.compact: no table at $dir"))
    writeSorted(spark.read.parquet(src.getPath), p.tmp.getPath,
      sortCols, numFiles)
    AtomicStore.promote(p, Some(src), "Layout.compact")
  }
}
