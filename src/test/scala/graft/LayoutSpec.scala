package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Z-order layout: Morton bit math, equi-depth buckets, and the
  * multi-dimensional pruning property the layout exists for.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits: dimension j's bit i lands at i*n+j") {
    // x=3 (011), y=5 (101), 3 bits → positions x:0,2,4 y:1,3,5 →
    // 1 + 2 + 4 + 0 + 0 + 32 = 39
    val v = spark.range(1)
      .select(Layout.zValue(Seq(lit(3L), lit(5L)), 3).as("z"))
      .head().getLong(0)
    assert(v == 39L)
    // identity checks: all-zeros and all-ones
    val z0 = spark.range(1)
      .select(Layout.zValue(Seq(lit(0L), lit(0L)), 4)).head().getLong(0)
    val z1 = spark.range(1)
      .select(Layout.zValue(Seq(lit(15L), lit(15L)), 4)).head().getLong(0)
    assert(z0 == 0L && z1 == 255L)
  }

  test("zValue is a bijection on the bucket grid (decode recovers " +
    "every tuple)") {
    // all 16×16 bucket pairs → 256 DISTINCT z-values that decode back
    val rows = spark.range(256).select(
      (col("id") % 16).as("bx"), (col("id") / 16).cast("long").as("by"))
      .select(col("bx"), col("by"),
        Layout.zValue(Seq(col("bx"), col("by")), 4).as("z"))
      .as[(Long, Long, Long)].collect()
    assert(rows.map(_._3).distinct.length == 256)
    def deinterleave(z: Long, j: Int): Long =
      (0 until 4).map(i => ((z >> (i * 2 + j)) & 1L) << i).sum
    rows.foreach { case (bx, by, z) =>
      assert(deinterleave(z, 0) == bx && deinterleave(z, 1) == by,
        s"z=$z should decode to ($bx, $by)")
    }
  }

  test("equiDepthCuts + bucketOf quantize uniformly; nulls stay null") {
    val df = spark.range(1, 101).select(col("id").cast("double").as("v"))
    val cuts = Layout.equiDepthCuts(df, "v", 2)
    assert(cuts.length == 3)
    val counts = df.select(Layout.bucketOf(col("v"), cuts).as("b"))
      .groupBy("b").count().as[(Long, Long)].collect().toMap
    assert(counts.keySet == Set(0L, 1L, 2L, 3L))
    assert(counts.values.forall(c => c >= 24 && c <= 26),
      s"equi-depth buckets should be ~25 each: $counts")
    val nb = Seq(Option.empty[Double]).toDF("v")
      .select(Layout.bucketOf(col("v"), cuts)).head()
    assert(nb.isNullAt(0))
  }

  test("compactionPlan packs exact byte totals; compactTo applies it; " +
    "empty input plans one file") {
    val df = spark.range(10).select(lit("x").as("t"))
    // 10 rows × 100 bytes, 300-byte target → ceil(1000/300) = 4 files
    val plan = Layout.compactionPlan(df, lit(100L), targetBytes = 300L)
      .head()
    assert(plan.getLong(0) == 10L && plan.getLong(1) == 1000L &&
      plan.getLong(2) == 4L)
    assert(Layout.compactTo(df, lit(100L), 300L).rdd.getNumPartitions == 4)
    val empty = Layout.compactionPlan(df.limit(0), lit(100L), 300L).head()
    assert(empty.getLong(0) == 0L && empty.getLong(1) == 0L &&
      empty.getLong(2) == 1L)
  }

  test("approx equi-depth cuts track the exact form within one value " +
    "step (the 100 TB swap is safe for coarse bins)") {
    val df = spark.range(1, 10001).select(col("id").cast("double").as("v"))
    val exact = Layout.equiDepthCuts(df, "v", 4)
    val approx = Layout.equiDepthCuts(df, "v", 4, exact = false)
    assert(approx.length == exact.length)
    val maxDev = exact.zip(approx).map { case (e, a) => math.abs(e - a) }.max
    // accuracy 10000 bounds rank error to n/10000 = 1 rank ≈ 1.0 in
    // value on this integer fixture — far inside the ~625-wide buckets
    assert(maxDev <= 2.0, s"approx cuts deviate by $maxDev: $approx vs $exact")
    // and the buckets the approx cuts induce stay equi-depth
    val counts = df.select(Layout.bucketOf(col("v"), approx).as("b"))
      .groupBy("b").count().as[(Long, Long)].collect().toMap
    assert(counts.size == 16 &&
      counts.values.forall(c => c >= 575 && c <= 675),
      s"approx-cut buckets should be ~625 each: $counts")
  }

  test("optimizeTable composes sizing and layout: target file count hit, " +
    "per-file z-ranges disjoint") {
    val grid = spark.range(4096).select(
      (col("id") % 64).cast("double").as("x"),
      (col("id") / 64).cast("double").as("y"))
    // 4096 rows × 16 B into 16 KiB files → 4 files
    val opt = Layout.optimizeTable(grid, Seq("x", "y"), bits = 4,
      sizeExpr = lit(16L), targetBytes = 16384L)
    val dir = java.nio.file.Files.createTempDirectory("graft-opt").toFile
    try {
      opt.write.parquet(s"$dir/t")
      val files = new java.io.File(s"$dir/t").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length == 4, s"planned 4 files, wrote ${files.length}")
      // z-ranges per FILE must be pairwise disjoint — the property that
      // makes every file a prunable box
      val cuts = Seq("x", "y").map(c => Layout.equiDepthCuts(grid, c, 4))
      val z = Layout.zValue(Seq("x", "y").zip(cuts).map { case (c, cu) =>
        Layout.bucketOf(col(c), cu) }, 4)
      val ranges = spark.read.parquet(s"$dir/t")
        .select(input_file_name().as("f"), z.as("z"))
        .groupBy("f").agg(min("z").as("lo"), max("z").as("hi"))
        .as[(String, Long, Long)].collect().sortBy(_._2)
      assert(ranges.length == 4)
      ranges.sliding(2).foreach { case Array(a, b) =>
        assert(a._3 < b._2,
          s"file z-ranges overlap: ${a._1} [${a._2},${a._3}] vs " +
            s"${b._1} [${b._2},${b._3}]")
      }
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("z-ordered PARQUET files carry box-compact row-group stats and " +
    "the scan actually skips them (footer readout + scan metrics)") {
    import scala.jdk.CollectionConverters._
    import org.apache.hadoop.fs.{Path => HPath}
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val dir = java.nio.file.Files.createTempDirectory("graft-zfiles").toFile
    try {
      // SCRAMBLED source order (deterministic hash sort): spark.range's
      // natural order is y-major, which accidentally y-clusters the
      // no-sort control's row groups — the scramble makes "no within-
      // file sort" mean genuinely unordered rows. localCheckpoint
      // FREEZES the scrambled order: EliminateSorts would otherwise
      // drop an orderBy sitting under the layout's repartitionByRange
      val grid = spark.range(4096).select(
        (col("id") % 64).cast("double").as("x"),
        (col("id") / 64).cast("double").as("y"))
        .orderBy(pmod(hash(col("x"), col("y")), lit(997)))
        .localCheckpoint()
      // small parquet block size → several row groups per file, so the
      // WITHIN-file sort is load-bearing, not just the range shuffle
      def writeTo(df: DataFrame, sub: String): String = {
        val p = s"$dir/$sub"
        df.write.option("parquet.block.size", 4096).parquet(p)
        p
      }
      val zdir = writeTo(Layout.zorderRepartition(grid, Seq("x", "y"),
        bits = 4, numPartitions = 4), "z")
      val zNoSortDir = writeTo(Layout.zorderRepartition(grid, Seq("x", "y"),
        bits = 4, numPartitions = 4, sortWithinFiles = false), "znosort")
      val xdir = writeTo(grid.repartitionByRange(4, col("x"))
        .sortWithinPartitions(col("x")), "x")

      // FOOTER READOUT: per-row-group [min,max] for x and y from the
      // real parquet metadata — what a 100 TB scan prunes on
      def rowGroups(d: String): Seq[(Double, Double, Double, Double, Long)] = {
        val conf = spark.sessionState.newHadoopConf()
        new java.io.File(d).listFiles().toSeq
          .filter(_.getName.endsWith(".parquet")).flatMap { f =>
            val rd = ParquetFileReader.open(HadoopInputFile.fromPath(
              new HPath(f.getAbsolutePath), conf))
            try rd.getFooter.getBlocks.asScala.toSeq.map { b =>
              val s = b.getColumns.asScala
                .map(c => c.getPath.toDotString -> c.getStatistics).toMap
              (s("x").genericGetMin.asInstanceOf[Double],
                s("x").genericGetMax.asInstanceOf[Double],
                s("y").genericGetMin.asInstanceOf[Double],
                s("y").genericGetMax.asInstanceOf[Double],
                b.getRowCount)
            } finally rd.close()
          }
      }
      val zGroups = rowGroups(zdir)
      assert(zGroups.length >= 8,
        s"block-size option should split files into row groups: $zGroups")
      // the 1/64-of-space box [0,7]² intersects row groups holding a
      // small fraction of the table (each sorted row group is a
      // compact z-range = a compact box)
      def hitRows(gs: Seq[(Double, Double, Double, Double, Long)]): Long =
        gs.filter(g => g._1 <= 7.0 && g._3 <= 7.0).map(_._5).sum
      val zHit = hitRows(zGroups)
      assert(zHit <= 1024,
        s"z-sorted row groups intersecting the box hold $zHit rows")
      // remove the within-file sort → every row group spans its whole
      // partition box → strictly coarser stats
      val noSortHit = hitRows(rowGroups(zNoSortDir))
      assert(zHit < noSortHit,
        s"within-file sort must tighten row-group stats: $zHit vs $noSortHit")
      // PRUNED-SCAN ASSERTION: the parquet reader skips those row
      // groups for real (scan-node output rows, before the post-scan
      // filter re-evaluates)
      def scanned(d: String, p: Column): Long = {
        val q = spark.read.parquet(d).filter(p)
        q.collect()
        val scan = q.queryExecution.executedPlan.collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec => s
        }.head
        scan.metrics("numOutputRows").value
      }
      val zScan = scanned(zdir, col("x") <= 7.0 && col("y") <= 7.0)
      assert(zScan <= zHit,
        s"scan must skip non-intersecting row groups: read $zScan of 4096")
      // negative control: the 1-D x-sorted layout cannot prune a
      // y-only predicate — every full row group spans the whole y
      // range (a tiny flush-boundary row group may skip a few rows;
      // ≥98% scanned vs the z layout's ≤25% is the property)
      val xScan = scanned(xdir, col("y") <= 7.0)
      assert(xScan >= 4000L,
        s"x-sorted layout should scan ~everything on a y predicate: $xScan")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("z-ordered partitions form compact boxes: a 2-D box predicate " +
    "prunes where a 1-D sort cannot") {
    // 64×64 uniform grid, 16 output partitions
    val grid = spark.range(4096).select(
      (col("id") % 64).cast("double").as("x"),
      (col("id") / 64).cast("double").as("y"))
    def overlapping(df: DataFrame, xMax: Double, yMax: Double): Long = {
      // partitions whose [min,max] box intersects [0,xMax]×[0,yMax] —
      // exactly what file-level min/max stats let a scan skip
      df.groupBy(spark_partition_id().as("pid"))
        .agg(min("x").as("x0"), min("y").as("y0"))
        .filter(col("x0") <= xMax && col("y0") <= yMax)
        .count()
    }
    val zdf = Layout.zorderRepartition(grid, Seq("x", "y"),
      bits = 4, numPartitions = 16)
    val xdf = grid.repartitionByRange(16, col("x"))
    // box covering 1/64 of the space: the z layout confines it to a
    // handful of partitions
    assert(overlapping(zdf, 7.0, 7.0) <= 4,
      s"z-layout: ${overlapping(zdf, 7.0, 7.0)} partitions overlap the box")
    // y-only predicate: the x-sorted layout cannot prune AT ALL (every
    // partition spans the full y range); the z layout still prunes
    val zY = overlapping(zdf, 63.0, 7.0)
    val xY = overlapping(xdf, 63.0, 7.0)
    assert(xY == 16L, s"x-sorted layout should overlap all: $xY")
    assert(zY <= 8L, s"z-layout should prune the y-only predicate: $zY")
    // within-partition order: rows arrive z-sorted, so a parquet writer
    // gets z-contiguous ROW GROUPS (row-group stats prune inside files)
    val cuts = Seq("x", "y").map(c => Layout.equiDepthCuts(grid, c, 4))
    val sortedInside = zdf
      .select(Layout.zValue(Seq("x", "y").zip(cuts).map { case (c, cu) =>
        Layout.bucketOf(col(c), cu) }, 4).as("z"))
      .mapPartitions { it =>
        var prev = Long.MinValue
        var ok = true
        it.foreach { r => val z = r.getLong(0); if (z < prev) ok = false; prev = z }
        Iterator.single(ok)
      }.collect()
    assert(sortedInside.forall(identity),
      "every partition must be z-sorted internally")
  }
}
