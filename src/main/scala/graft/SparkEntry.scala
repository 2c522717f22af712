package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.QShared.docsAsCorpus
import graft.operators.Jaccard

/** Driver contract — the engine's query surface over the driver's parquet
  * fixtures, with a DuckDB-runnable oracle per query.
  *
  * Conventions keeping the Spark result and the DuckDB oracle hash-equal:
  *   - integer outputs are always BIGINT (Spark `long`);
  *   - money/ratio aggregates sum exact DECIMAL then cast to DOUBLE (sum
  *     order independence), or are pure double arithmetic on identical
  *     inputs (bit-identical in both engines);
  *   - every query ends in a total ORDER BY (deterministic row order);
  *   - hashes are md5-derived (portable), never Spark-internal murmur3.
  */
object SparkEntry {

  def entry(spark: SparkSession): DataFrame =
    Jaccard.allPairs(docsAsCorpus(spark, "/root/testdata/sf0.001"))

  // ---------------------------------------------------------------- queries

  /** The full registry, composed from the per-domain slices (each
    * under ~1,500 lines; the shared fixture/oracle fragments live in
    * [[QShared]]). Composition CHECKS key disjointness — `Map ++`
    * silently shadows duplicates, so a re-used key in a later slice
    * would otherwise make a query vanish with no error.
    */
  private def composed[T](slices: Seq[Map[String, T]],
                          what: String): Map[String, T] = {
    val m = slices.reduce(_ ++ _)
    require(slices.map(_.size).sum == m.size,
      s"duplicate $what key across registry slices: " +
        slices.flatMap(_.keys).groupBy(identity).collect {
          case (k, vs) if vs.size > 1 => k
        }.mkString(", "))
    m
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    composed(Seq(RelationalQueries.queries, JaccardQueries.queries,
      DedupQueries.queries, AnnQueries.queries, TextQueries.queries,
      MmQueries.queries, WebQueries.queries), "query")

  def oracleSql: Map[String, String] =
    composed(Seq(RelationalQueries.oracles, JaccardQueries.oracles,
      DedupQueries.oracles, AnnQueries.oracles, TextQueries.oracles,
      MmQueries.oracles, WebQueries.oracles), "oracle")
}
