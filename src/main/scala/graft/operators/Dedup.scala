package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions, TextFunctions}

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Four families, cheapest-first — the order a real pipeline applies them:
  *   1. exact (content-hash groupBy)
  *   2. MinHash + LSH banding (near-dup candidates without all-pairs)
  *   3. SimHash (Hamming-ball near-dups)
  *   4. n-gram Jaccard (exact set-similarity verification of candidates)
  *
  * Scale notes: every operator shuffles by a *hash* key (content hash, LSH
  * band key, SimHash prefix) — never by raw text — so partitions stay
  * balanced regardless of document-length skew. Nothing here does an
  * unbounded all-pairs join: LSH/banding bounds candidate generation, and
  * the exact verifiers are meant to run on candidate pairs only.
  */
object Dedup {

  /** Exact duplicate groups by md5 of the raw text. Returns one row per
    * distinct content: the keeper (min id), copy count, and content hash.
    * At 100 TB this is one hash-partitioned aggregation — the canonical
    * first dedup pass.
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(md5(col(textCol)).as("text_hash"), col(idCol))
      .groupBy("text_hash")
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Rows that survive exact dedup (keeper per content group). */
  def exactDeduped(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.join(
      exactGroups(docs, idCol, textCol).select(col("keeper_id").as(idCol)),
      idCol)

  /** Per-document MinHash signature, exploded to (id, perm, min_hash) rows
    * (exploded form is oracle-friendly and joins cheaply).
    */
  def minHashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        k: Int): DataFrame =
    docs
      .select(col(idCol),
        TextFunctions.normalizeTokens(col(textCol)).as("tokens"))
      .filter(size(col("tokens")) > 0)
      .select(col(idCol),
        posexplode(HashFunctions.minHashSignature(col("tokens"), k))
          .as(Seq("perm", "min_hash")))

  /** LSH candidate pairs: band the k-perm signature into `bands` bands of
    * k/bands rows; docs sharing any band key become a candidate pair.
    * The band key is (band#, hash-of-band-rows) — the shuffle key — so no
    * all-pairs join ever happens; hot buckets are bounded by band width.
    * Output: (id_a, id_b, n_shared_bands), id_a < id_b.
    */
  def lshCandidates(signatures: DataFrame, idCol: String, k: Int,
                    bands: Int): DataFrame = {
    require(k % bands == 0, s"bands ($bands) must divide k ($k)")
    val rowsPerBand = k / bands
    val banded = signatures
      .withColumn("band", (col("perm") / lit(rowsPerBand)).cast("int"))
      .groupBy(col(idCol), col("band"))
      // perms arrive unordered after the shuffle; re-impose perm order so
      // the band key is deterministic. The key is the minhash array itself
      // (arrays are orderable join keys in Spark) — no serialization
      // format to keep portable.
      .agg(transform(
        sort_array(collect_list(struct(col("perm"), col("min_hash")))),
        s => s.getField("min_hash")).as("band_key"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_key") === col("b.band_key") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
  }

  /** MinHash-estimated Jaccard for given candidate pairs: fraction of the k
    * permutations on which the two signatures agree.
    */
  def minHashEstimate(candidates: DataFrame, signatures: DataFrame,
                      idCol: String, k: Int): DataFrame =
    candidates
      .join(signatures.select(col(idCol).as("id_a"), col("perm"),
        col("min_hash").as("mh_a")), Seq("id_a"))
      .join(signatures.select(col(idCol).as("id_b"), col("perm"),
        col("min_hash").as("mh_b")), Seq("id_b", "perm"))
      .groupBy("id_a", "id_b")
      .agg((sum(when(col("mh_a") === col("mh_b"), 1).otherwise(0))
        .cast("double") / k).as("est_jaccard"))

  /** Per-document SimHash (bits-wide, from md5-derived token hashes). */
  def simHashes(docs: DataFrame, idCol: String, textCol: String,
                bits: Int = 32): DataFrame =
    docs
      .select(col(idCol),
        TextFunctions.normalizeTokens(col(textCol)).as("tokens"))
      .filter(size(col("tokens")) > 0)
      .withColumn("hashes",
        transform(col("tokens"), t => HashFunctions.md5Long(t)))
      .select(col(idCol),
        HashFunctions.simHash(col("hashes"), bits).as("simhash"))

  /** SimHash near-dup pairs within a blocking column (e.g. source shard):
    * Hamming distance ≤ maxHamming. Blocking keeps the pair join bounded;
    * at scale, block on SimHash prefix bands instead (same operator, the
    * blocking column being a prefix expression).
    */
  def simHashNearDups(simHashes: DataFrame, idCol: String,
                      blockCol: Column, maxHamming: Int): DataFrame = {
    val withBlock = simHashes.withColumn("block", blockCol)
    withBlock.as("a")
      .join(withBlock.as("b"),
        col("a.block") === col("b.block") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram (word-shingle) Jaccard for pairs within a blocking
    * column. This is the verification stage run on LSH/SimHash candidates —
    * `array_intersect`/set sizes on already-shingled docs.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, blockCol: Column,
                        minJaccard: Double): DataFrame = {
    val sh = docs
      .withColumn("block", blockCol)
      .select(col(idCol), col("block"),
        TextFunctions.wordShingles(col(textCol), n).as("shingles"))
      .filter(size(col("shingles")) > 0)
    sh.as("a")
      .join(sh.as("b"),
        col("a.block") === col("b.block") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(
        col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        size(array_intersect(col("a.shingles"), col("b.shingles")))
          .as("inter"),
        size(col("a.shingles")).as("size_a"),
        size(col("b.shingles")).as("size_b"))
      .withColumn("jaccard",
        Jaccard.jaccardScore(col("inter"), col("size_a"), col("size_b")))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Embedding near-dup pairs: cosine ≥ threshold within a blocking column.
    * Exact verification operator — candidate generation at scale is
    * `Knn.lshBuckets`.
    */
  def cosineNearDups(embs: DataFrame, idCol: String, vecCol: String,
                     blockCol: Column, minCosine: Double): DataFrame = {
    val e = embs.withColumn("block", blockCol)
      .select(col(idCol), col("block"), col(vecCol).as("vec"))
    e.as("a")
      .join(e.as("b"),
        col("a.block") === col("b.block") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        Knn.cosine(col("a.vec"), col("b.vec")).as("cosine"))
      .filter(col("cosine") >= minCosine)
  }
}
