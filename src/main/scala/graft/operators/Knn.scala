package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.HashFunctions

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Two paths:
  *   - `bruteForceTopK` — exact baseline: queries × corpus cross join with
  *     a per-query top-k window. Correct at any k; cost |Q|·|C|. The right
  *     choice when |Q| is small (it broadcasts the queries).
  *   - `lshBuckets` / `lshTopK` — scale path: sign-random-projection LSH.
  *     Each vector hashes to a bucket id from the signs of `planes`
  *     pseudo-random hyperplane dot products; candidates = same-bucket
  *     pairs, so the join is an equi-join on bucket id (shuffle by bucket,
  *     no cross join). Recall is tuned by `tables` independent hash tables.
  *
  * All arithmetic is done in float64 after explicitly casting each float32
  * element — deterministic and reproducible in the DuckDB oracle (same
  * cast, same left-to-right summation).
  */
object Knn {

  /** Cosine similarity of two `array<float>` columns, computed as
    * fold-left double sums (portable, codegen'd, no UDF).
    */
  def cosine(a: Column, b: Column): Column = {
    def dsum(xs: Column): Column =
      aggregate(xs, lit(0.0), (acc, x) => acc + x)
    val dot = dsum(zip_with(a, b,
      (x, y) => x.cast("double") * y.cast("double")))
    val na = dsum(transform(a, x => x.cast("double") * x.cast("double")))
    val nb = dsum(transform(b, x => x.cast("double") * x.cast("double")))
    dot / (sqrt(na) * sqrt(nb))
  }

  /** Exact top-k: for each query vector, the k nearest corpus vectors by
    * cosine. `queries` is expected to be small — it is broadcast, making
    * the cross join a map-side nested loop; the heavy side streams.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplane component for (table, plane,
    * dim) — derived from the portable md5 hash, mapped to [-0.5, 0.5).
    */
  private def planeComponent(table: Int, plane: Int, dim: Column): Column =
    ((HashFunctions.md5Long(
      concat_ws(":", lit("plane"), lit(table), lit(plane), dim))
      % 1000000L) - 500000L).cast("double") / 1000000.0

  /** Sign-random-projection bucket id for one hash table: an integer in
    * [0, 2^planes) from the signs of `planes` hyperplane projections.
    */
  def lshBucket(vec: Column, table: Int, planes: Int): Column =
    (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * planeComponent(table, p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** (id, htable, bucket) assignment for every vector — the shuffle-ready
    * index. Same-bucket ids are ANN candidates. ("htable" = hash-table
    * index; not named "table" to stay SQL-identifier-safe.)
    */
  def lshBuckets(embs: DataFrame, idCol: String, vecCol: String,
                 tables: Int, planes: Int): DataFrame =
    embs.select(
      col(idCol),
      posexplode(array((0 until tables).map(t =>
        lshBucket(col(vecCol), t, planes)): _*)).as(Seq("htable", "bucket")))

  /** Approximate top-k: candidates from any shared (table, bucket), exact
    * cosine re-rank on candidates only. Equi-join on the bucket id — the
    * cross join never materializes.
    */
  def lshTopK(embs: DataFrame, idCol: String, vecCol: String, k: Int,
              tables: Int = 4, planes: Int = 8): DataFrame = {
    val ids = lshBuckets(embs, idCol, vecCol, tables, planes)
    val candidates = ids.as("a")
      .join(ids.as("b"),
        col("a.htable") === col("b.htable") &&
          col("a.bucket") === col("b.bucket") &&
          col(s"a.$idCol") =!= col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("query_id"),
        col(s"b.$idCol").as("neighbor_id"))
      .distinct()
    val vecs = embs.select(col(idCol), col(vecCol))
    val scored = candidates
      .join(vecs.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
        "query_id")
      .join(vecs.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")),
        "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
