package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Physical-layout ANALYSIS: the decisions that dominate cost at 100 TB
  * happen before any query runs — how rows are assigned to files (data
  * clustering) and how keys distribute over partitions (skew). Both ops
  * here produce the *reports* an operator of a large corpus acts on, and
  * both are exact and oracle-checkable. The write-side counterpart (the
  * layouts themselves) is `graft.sources.Layout.writeSorted` /
  * `writeZOrdered`; this module quantifies what those layouts buy.
  */
object LayoutAnalysis {

  /** Bit-interleave two 16-bit non-negative ints into a 32-bit Z-address
    * (Morton order). Pure shift/mask/add — stays inside whole-stage
    * codegen; no UDF, no loop at runtime (the 32 terms are unrolled into
    * one expression tree at plan build). */
  private[graft] def interleave16(x: Column, y: Column): Column = {
    val terms =
      (0 until 16).map(i =>
        shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) ++
      (0 until 16).map(i =>
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    terms.reduce(_ + _)
  }

  /** Z-order vs natural file layout: for 8 fixed range boxes over two
    * uniform 16-bit dimensions, how many of 64 files a min/max-pruned
    * scan must touch under (a) the natural insert-order layout and (b) a
    * Z-address range layout. The dimensions are md5-derived from the row
    * key (deterministic, uniform, engine-identical), so the natural
    * layout is uncorrelated with them — every box touches ~all natural
    * files while the Z layout bounds each box to the files whose Z range
    * the box intersects. This is the file-skipping arithmetic behind
    * Delta/Iceberg Z-clustering, reproduced exactly.
    *
    * Scale notes (100 TB): the Z-address is scan-shaped codegen
    * arithmetic; file assignment is a RANGE bucket of the address (the
    * way real writers assign file boundaries), NOT an ntile — no global
    * sort, no single-partition window. Per-file min/max stats are one
    * groupBy bounded by the file count, and the pruning join is
    * boxes(8) x files(64) — constant, independent of row volume. */
  def zorderSkipping(lineitem: DataFrame, files: Int = 64): DataFrame = {
    val spark = lineitem.sparkSession
    val d = lineitem
      .select(col("l_orderkey").as("ok"), col("l_linenumber").as("ln"))
      .withColumn("x", graft.sources.Sampling.hex8Int(
        md5(concat(col("ok").cast("string"), lit("x"),
          col("ln").cast("string")))) % 65536)
      .withColumn("y", graft.sources.Sampling.hex8Int(
        md5(concat(col("ok").cast("string"), lit("y"),
          col("ln").cast("string")))) % 65536)
      .withColumn("zaddr", interleave16(col("x"), col("y")))
      .withColumn("nat", col("ok") * 8 + col("ln"))
    // natural layout: contiguous key ranges (insert order); z layout:
    // contiguous Z-address ranges. Both are range buckets, not ntiles.
    val maxNat = d.agg((max(col("nat")) + 1).as("__maxnat"))
    val fl = d.crossJoin(broadcast(maxNat))
      .withColumn("file_nat",
        floor(col("nat") / (floor(col("__maxnat") / files) + 1)))
      .withColumn("file_z", floor(col("zaddr") / ((1L << 32) / files)))
      .select("x", "y", "file_nat", "file_z")
    def stats(fileCol: String): DataFrame = fl.groupBy(col(fileCol).as("f"))
      .agg(min("x").as("xmin"), max("x").as("xmax"),
        min("y").as("ymin"), max("y").as("ymax"))
    val boxes = spark.range(0, 8).toDF("pred_id")
      .withColumn("x0", col("pred_id") * 8192)
      .withColumn("x1", col("pred_id") * 8192 + 12287)
      .withColumn("y0", lit(8192L)).withColumn("y1", lit(40959L))
    def scanned(st: DataFrame, out: String): DataFrame = boxes
      .join(st, col("x0") <= col("xmax") && col("x1") >= col("xmin") &&
        col("y0") <= col("ymax") && col("y1") >= col("ymin"))
      .groupBy("pred_id").agg(count(lit(1)).as(out))
    boxes.select("pred_id")
      .join(scanned(stats("file_nat"), "files_nat"), Seq("pred_id"), "left")
      .join(scanned(stats("file_z"), "files_z"), Seq("pred_id"), "left")
      .select(col("pred_id"),
        coalesce(col("files_nat"), lit(0L)).as("files_nat"),
        coalesce(col("files_z"), lit(0L)).as("files_z"))
      .orderBy("pred_id")
  }

  /** Join-key skew deciles: rank every distinct key by multiplicity
    * (descending), split the key population into 10 ntile deciles, and
    * report keys / rows / row-share / max multiplicity per decile — the
    * pre-flight report that decides whether a join needs salting and at
    * what factor (top-decile row share >> 10% = skew).
    *
    * Scale notes (100 TB): the obvious spelling is ntile() over ALL
    * distinct keys — an unpartitioned window that drags the whole key
    * domain (easily 10^8+ keys) into one task. This formulation never
    * ranks keys: it aggregates the count-of-counts histogram (bounded by
    * the number of DISTINCT MULTIPLICITIES, tiny by nature), derives each
    * multiplicity's rank interval with one cumulative sum over that tiny
    * frame, and intersects the intervals with the arithmetic ntile decile
    * boundaries. Keys of equal multiplicity are interchangeable, so every
    * decile aggregate (count, row sum, max) is exact — identical to the
    * ntile spelling the oracle uses. */
  def keySkewDeciles(df: DataFrame, keyCol: String): DataFrame = {
    val kc = df.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("cnt"))
    val cc = kc.groupBy("cnt").agg(count(lit(1)).as("kcnt"))
    // rank interval [lo, hi] of each multiplicity under (cnt DESC, key)
    // order; the window frame is the multiplicity histogram, not the keys
    val w = Window.orderBy(col("cnt").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val iv = cc.withColumn("hi", sum(col("kcnt")).over(w))
      .withColumn("lo", col("hi") - col("kcnt") + 1)
    val tot = kc.agg(count(lit(1)).as("nk"), sum("cnt").as("nr"))
    val dec = df.sparkSession.range(1, 11).toDF("decile")
      .crossJoin(broadcast(tot))
      // ntile boundary arithmetic: first (nk % 10) deciles get the extra row
      .withColumn("dlo", (col("decile") - 1) * floor(col("nk") / 10) +
        least(col("decile") - 1, col("nk") % 10) + 1)
      .withColumn("dhi", col("decile") * floor(col("nk") / 10) +
        least(col("decile"), col("nk") % 10))
    dec.join(iv, col("lo") <= col("dhi") && col("hi") >= col("dlo"))
      .withColumn("ov",
        least(col("hi"), col("dhi")) - greatest(col("lo"), col("dlo")) + 1)
      .groupBy("decile", "nr")
      .agg(sum(col("ov")).as("keys"),
        sum(col("ov") * col("cnt")).as("rows_in_decile"),
        max(col("cnt")).as("max_cnt"))
      .select(col("decile"), col("keys"), col("rows_in_decile"),
        round(col("rows_in_decile").cast("double") / col("nr"), 4)
          .as("row_share"),
        col("max_cnt"))
      .orderBy("decile")
  }

  /** Small-file compaction plan (the Delta OPTIMIZE / Iceberg
    * rewrite-data-files decision, reproduced exactly): the day-grain
    * file inventory of the events table, binned into compaction targets
    * by RUNNING-SUM assignment within each partition —
    * bin = floor(cum_rows_before / targetRows) over files in day order.
    * Contiguous-range binning on purpose: unlike first-fit-decreasing it
    * PRESERVES the sort/cluster order of the layout being compacted (a
    * compaction that interleaves days would undo `writeSorted`), it is
    * deterministic, and an oversized file degrades to its own bin
    * instead of blocking the packer.
    *
    * Scale notes (100 TB): the planner's input is file METADATA — one
    * row per file, aggregated from the listing (here derived from the
    * events table so the oracle can replay it); the windows run
    * per-partition over file counts, never over rows. The execution of
    * the plan is `sources.Layout.compact`; this is the decision
    * report. */
  def compactionPlan(events: DataFrame, targetRows: Long = 4000L): DataFrame = {
    val inv = events.groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("rows"))
    val perBin = Window.partitionBy("event_type", "bin")
    inv
      .withColumn("bin",
        expr(s"coalesce(sum(rows) over (partition by event_type order by day" +
          s" rows between unbounded preceding and 1 preceding), 0) div $targetRows"))
      .withColumn("bin_rows", sum("rows").over(perBin))
      .withColumn("bin_files", count(lit(1)).over(perBin))
      .select(col("event_type"), col("day"), col("rows"), col("bin"),
        col("bin_rows"), col("bin_files"),
        (col("bin_files") > 1).cast("int").as("merged"))
      .orderBy("event_type", "day")
  }
}
