package graft

import org.apache.spark.sql.DataFrame
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
