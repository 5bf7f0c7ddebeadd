package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for the training-data tier (SURVEY.md §2.8):
 * exact, MinHash+LSH banding, SimHash — all expression-level
 * (codegen'd, no UDFs) and deterministic (xxhash64 seeds fixed by
 * position), so results are stable across runs and cluster sizes.
 *
 * Scale design: the naive all-pairs Jaccard join is quadratic in the
 * document-frequency of each shingle; MinHash+LSH replaces it with a
 * band-bucket equi-join whose fan-out is bounded by the banding
 * parameters, then verifies ONLY candidate pairs exactly. At 100 TB:
 * shuffle keys are (band, bandHash) — high cardinality, uniformly
 * hash-distributed, AQE-skew-safe.
 */
object Dedup {

  /** Exact dedup: one keeper (min id) per identical key column. */
  def exact(df: DataFrame, idCol: String, keyCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Distinct word n-gram shingles: (id, shingle). */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    df.withColumn("_w", split(col(textCol), " "))
      .select(col(idCol),
        explode(expr(
          s"transform(sequence(1, greatest(size(_w) - ${n - 1}, 0)), " +
            s"i -> concat_ws(' ', ${(0 until n).map(j => s"element_at(_w, i + $j)").mkString(", ")}))"))
          .as("shingle"))
      .distinct()

  /**
   * MinHash signatures as ONE wide aggregation: k `min` columns over
   * k independent hashes of the shingle (xxhash64(s, i) —
   * deterministic, no seed tables to ship). Map-side partial
   * aggregation reduces each partition to one row per doc BEFORE the
   * shuffle — vs. the naive posexplode formulation that shuffles
   * |shingles| * k rows (a 128x row blowup at k=128).
   * Output: (id, mh_0 .. mh_{k-1}).
   */
  def minhash(sh: DataFrame, idCol: String, k: Int = 128): DataFrame = {
    // Hash the (variable-length) shingle string ONCE, then derive the
    // k independent hashes from that 8-byte value — k string hashes
    // per shingle would dominate the whole pipeline's CPU.
    val aggs = (0 until k).map(i => min(xxhash64(col("_h0"), lit(i))).as(s"mh_$i"))
    sh.withColumn("_h0", xxhash64(col("shingle")))
      .groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /**
   * LSH banding: k/bands consecutive signature columns hash into one
   * band key; documents sharing ANY (band, key) become candidates.
   * Only `bands` rows per doc enter the join — the equi-join key
   * (band, band_key) is high-cardinality and uniformly distributed.
   * With k=128, bands=32 (4 rows/band): P[miss | s=0.7] ≈ 1-5e-4.
   */
  def lshCandidates(minhashed: DataFrame, idCol: String, k: Int = 128, bands: Int = 32): DataFrame = {
    val rowsPerBand = k / bands
    val bandKeys = (0 until bands).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"mh_$i"))
      struct(lit(b).as("band"), xxhash64(cols: _*).as("band_key"))
    }
    // persist: the self-join consumes this twice; without the cache the
    // whole 128-hash signature aggregation runs once per side
    val bandSig = minhashed
      .select(col(idCol), explode(array(bandKeys: _*)).as("bk"))
      .select(col(idCol), col("bk.band").as("band"), col("bk.band_key").as("band_key"))
      .persist()
    val a = bandSig.select(col(idCol).as("id_a"), col("band"), col("band_key"))
    val b = bandSig.select(col(idCol).as("id_b"), col("band"), col("band_key"))
    a.join(b, Seq("band", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /**
   * Full MinHash near-dup pipeline with exact verification:
   * candidates from LSH, then true Jaccard (on the same shingle sets)
   * only for candidate pairs; keep pairs with
   * jaccard >= num/den (integer cross-multiplication, no float).
   * Verified output is deterministic and (up to LSH recall, ~1-5e-4
   * misses at the default banding) equals the exact all-pairs result.
   *
   * Cache contract: the pipeline persists intermediates (shingles,
   * band signatures) that live until `spark.catalog.clearCache()` or
   * session end — a long-lived driver running many dedup jobs should
   * clear between jobs (Bench/Verify do exactly that).
   */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      shingleN: Int = 3, k: Int = 128, bands: Int = 32,
                      num: Int = 7, den: Int = 10): DataFrame = {
    val sh = shingles(df, idCol, textCol, shingleN).persist()
    val cands = lshCandidates(minhash(sh, idCol, k), idCol, k, bands)
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n_sh"))
    val shA = sh.select(col(idCol).as("id_a"), col("shingle"))
    val shB = sh.select(col(idCol).as("id_b"), col("shingle"))
    val common = cands.join(shA, "id_a").join(shB, Seq("id_b", "shingle"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.select(col(idCol).as("id_a"), col("n_sh").as("na")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), col("n_sh").as("nb")), "id_b")
      .filter(col("n_common") * den >= (col("na") + col("nb") - col("n_common")) * num)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
        col("n_common"), col("na"), col("nb"))
  }

  /**
   * 64-bit SimHash over the word set: bit j of the fingerprint is the
   * sign of Σ_tokens (bit j of xxhash64(token) ? +1 : -1).
   * Near-identical token sets land on identical or low-Hamming
   * fingerprints — an O(n) alternative to pairwise comparison.
   */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tokens = df
      .select(col(idCol), explode(array_distinct(split(col(textCol), " "))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums: Seq[Column] = (0 until 64).map { j =>
      sum(when(expr(s"(h >> $j) & 1") === 1, 1).otherwise(-1)).as(s"b$j")
    }
    val summed = tokens.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val fpCol = (0 until 64)
      .map(j => when(col(s"b$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    summed.select(col(idCol), fpCol.as("simhash"))
  }

  /** SimHash near-dup candidates: pairs whose fingerprints match on
    * any of 4 16-bit chunks, verified by Hamming distance <= maxDist.
    * (Chunk match is the pigeonhole guarantee for dist <= 3.) */
  def simhashNearDups(fps: DataFrame, idCol: String, maxDist: Int = 3): DataFrame = {
    val chunks = fps.select(col(idCol), col("simhash"),
      posexplode(expr(
        "transform(sequence(0, 3), c -> (simhash >> (c * 16)) & 65535)")).as(Seq("chunk_i", "chunk_v")))
    val a = chunks.select(col(idCol).as("id_a"), col("simhash").as("sh_a"), col("chunk_i"), col("chunk_v"))
    val b = chunks.select(col(idCol).as("id_b"), col("simhash").as("sh_b"), col("chunk_i"), col("chunk_v"))
    a.join(b, Seq("chunk_i", "chunk_v"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b").distinct()
      .withColumn("hamming", expr("bit_count(sh_a ^ sh_b)"))
      .filter(col("hamming") <= maxDist)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("hamming"))
  }
}
