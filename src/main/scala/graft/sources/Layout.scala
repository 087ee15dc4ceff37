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

  /** Z-order (Morton) layout: bit-interleave min-max-normalized key
    * columns into one clustering key, then range-sort on it. A single-key
    * range sort gives file-skipping on the LEADING key only — every file
    * spans the full range of the other columns. The z-curve localizes ALL
    * interleaved dimensions at once, so a selective predicate on any one
    * of them intersects ~n^((d-1)/d) of n files instead of all of them —
    * the standard multi-dimensional data-skipping layout for a 100 TB
    * estate queried on more than one column.
    *
    * Normalization is linear over the observed [min, max] (one tiny
    * driver-side aggregate; heavy skew compresses the mapping — pick
    * `bits` higher, or pre-transform skewed keys). NULL keys z-map to
    * null and range-sort first, clustering into the low files. The z-key
    * is a helper column dropped before write; the interleave itself is
    * plain shift/and/or built-ins — fully codegen'd, no UDF. */
  def writeZOrdered(df: DataFrame, dir: String, zCols: Seq[String],
                    numFiles: Int, bits: Int = 12): Unit = {
    require(zCols.size >= 2, "z-order needs >= 2 columns (use writeSorted for 1)")
    require(zCols.size * bits <= 63, "zCols.size * bits must fit a signed long")
    require(numFiles >= 1)
    require(!df.columns.contains("__z"), "column __z is reserved by writeZOrdered")
    // a non-orderable-as-number key would cast to all-NULL bounds and fall
    // into the constant-column branch below — every row z-maps to 0 on
    // that dimension, silently un-clustered (round-3 advice). Fail loudly.
    zCols.foreach { c =>
      import org.apache.spark.sql.types._
      val dt = df.schema(c).dataType
      val ok = dt match {
        case _: NumericType | DateType | TimestampType | TimestampNTZType => true
        case _ => false
      }
      require(ok, s"writeZOrdered: z-column '$c' has non-numeric type $dt — " +
        "z-ordering needs numeric/date/timestamp keys (hash or dictionary-" +
        "encode strings first)")
    }
    val boundsRow = df.agg(
      lit(0).as("_"),
      zCols.flatMap(c => Seq(
        min(col(c)).cast("double").as(s"lo_$c"),
        max(col(c)).cast("double").as(s"hi_$c"))): _*).head()
    val maxVal = (1L << bits) - 1
    val norm = zCols.zipWithIndex.map { case (c, i) =>
      val lo = Option(boundsRow.get(1 + 2 * i)).map(_.asInstanceOf[Double])
      val hi = Option(boundsRow.get(2 + 2 * i)).map(_.asInstanceOf[Double])
      (lo, hi) match {
        case (Some(l), Some(h)) if h > l =>
          least(lit(maxVal), floor(
            (col(c).cast("double") - l) / (h - l) * (maxVal + 1)).cast("long"))
        case _ => when(col(c).isNull, lit(null)).otherwise(lit(0L)) // constant/empty col
      }
    }
    val n = zCols.size
    val z = (0 until bits).flatMap { j =>
      norm.zipWithIndex.map { case (nc, i) =>
        shiftleft(nc.bitwiseAND(lit(1L << j)), j * (n - 1) + i)
      }
    }.reduce(_.bitwiseOR(_))
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
  }

  /** Compact an existing parquet directory to `numFiles` range-sorted
    * files — the maintenance pass that undoes incremental-append
    * fragmentation (e.g. a streaming sink's per-batch files). The swap
    * goes through AtomicStore's two-rename protocol: at every instant a
    * complete copy exists (a delete-then-rename spelling would leave NO
    * table if the process died in between — round-3 review). */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String,
              sortCols: Seq[String], numFiles: Int): Unit =
    compactWith(spark, dir, "Layout.compact")(
      (df, tmp) => writeSorted(df, tmp, sortCols, numFiles))

  /** `compact`, but to the z-ordered layout. */
  def compactZOrdered(spark: org.apache.spark.sql.SparkSession, dir: String,
                      zCols: Seq[String], numFiles: Int,
                      bits: Int = 12): Unit =
    compactWith(spark, dir, "Layout.compactZOrdered")(
      (df, tmp) => writeZOrdered(df, tmp, zCols, numFiles, bits))

  private def compactWith(spark: org.apache.spark.sql.SparkSession,
                          dir: String, label: String)(
                          write: (DataFrame, String) => Unit): Unit = {
    val f = new java.io.File(dir)
    val p = AtomicStore.paths(f.getParent, f.getName)
    val src = AtomicStore.live(p).getOrElse(
      throw new IllegalArgumentException(s"$label: no table at $dir"))
    write(spark.read.parquet(src.getPath), p.tmp.getPath)
    AtomicStore.promote(p, Some(src), label)
  }
}
