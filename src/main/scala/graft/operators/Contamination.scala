package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Benchmark decontamination for the training-data tier: flag (to then
 * drop) training documents that share word n-grams with an evaluation
 * / benchmark corpus, so the training set cannot memorize the test
 * set. This is the standard n-gram-collision decontamination used for
 * large LM corpora (13-gram overlap in the GPT-3 appendix; the Pile
 * uses the same shape) — here the n is a parameter because the
 * synthetic corpus' documents are short.
 *
 * Scale design: the eval side is a BENCHMARK, bounded by construction
 * (benchmarks are thousands of prompts, not a slice of the corpus), so
 * its distinct n-gram set broadcasts — the 100 TB training side is
 * never shuffled at all: each partition streams its documents, builds
 * shingles with the compiled kernel, probes the broadcast hash set,
 * and only (doc_id, n_hits) for CONTAMINATED docs (a tiny fraction)
 * reaches the aggregation. The broadcast is AQE's size-based choice,
 * not a forced hint: a genuinely bounded eval set always lands under
 * the broadcast threshold, while a mis-configured "eval" that is
 * really a slice of the corpus (and so grows with it) degrades to a
 * shuffled join instead of collecting terabytes onto the driver.
 */
object Contamination {

  /**
   * (id, n_shared_grams) for every training document sharing at least
   * `minMatches` distinct word n-grams with the eval corpus.
   *
   * Counting DISTINCT shared grams per doc needs no global distinct:
   * the shingle arrays are already per-document distinct (compiled
   * `WordShingles` kernel), so a plain count after the semi-probe is
   * exact.
   */
  def flagContaminated(train: DataFrame, eval: DataFrame,
                       idCol: String, textCol: String,
                       n: Int = 5, minMatches: Int = 1): DataFrame = {
    require(minMatches >= 1, "minMatches must be >= 1")
    val evalGrams = eval
      .select(explode(graft.functions.Shingles.wordShingles(col(textCol), n)).as("gram"))
      .distinct()
    val trainGrams = train.select(col(idCol),
      explode(graft.functions.Shingles.wordShingles(col(textCol), n)).as("gram"))
    trainGrams
      .join(evalGrams, "gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared_grams"))
      .filter(col("n_shared_grams") >= minMatches)
  }

  /**
   * Bloom-filter decontamination: identical result to
   * [[flagContaminated]] (bloom filters have no false negatives, and
   * every candidate is re-checked exactly), but the 100 TB training
   * side never reaches a shuffle at all unless a document is a
   * CANDIDATE. Three stages:
   *
   *   1. build — one pass over the bounded eval gram set aggregates
   *      per-partition Bloom filters; only the merged filter bits
   *      (megabytes) reach the driver, never the grams;
   *   2. prune — a map-side codegen probe ([[graft.functions.BloomGramHits]])
   *      drops every training document none of whose n-grams hit the
   *      filter: no shuffle, no join, no exchange for the clean bulk;
   *   3. verify — the exact explode + gram-join of [[flagContaminated]]
   *      runs only on the surviving candidates, so Bloom false
   *      positives cannot leak into the result.
   *
   * `fpp` is the PER-GRAM false-positive rate; a document becomes a
   * spurious candidate if ANY of its g grams false-positives
   * (~ g·fpp), so size fpp to targetDocFp / avgGramsPerDoc — the
   * default 1e-3 keeps spurious candidates ≈3% for ~30-gram docs at
   * a ~2 MB filter per million eval grams.
   *
   * This convenience form builds the filter EAGERLY (the count and
   * the filter aggregation run Spark jobs at call time — both touch
   * only the bounded eval side). A caller constructing several probe
   * plans from one benchmark — or plans it may never execute — should
   * [[buildEvalBloom]] ONCE and hand the bytes to the lazy overload.
   */
  def flagContaminatedBloom(train: DataFrame, eval: DataFrame,
                            idCol: String, textCol: String,
                            n: Int = 5, minMatches: Int = 1,
                            fpp: Double = 1e-3): DataFrame =
    flagContaminatedBloom(train, eval, idCol, textCol,
      buildEvalBloom(eval, textCol, n, fpp), n, minMatches)

  /** Lazy probe form: plants prebuilt filter bytes (the reusable
    * handle from [[buildEvalBloom]], or any serialized
    * `util.sketch.BloomFilter` over the same gram shape) into the
    * candidate filter — constructing this plan runs NO jobs. */
  def flagContaminatedBloom(train: DataFrame, eval: DataFrame,
                            idCol: String, textCol: String,
                            bloomBytes: Array[Byte],
                            n: Int, minMatches: Int): DataFrame = {
    val candidates = train.filter(
      graft.functions.BloomProbe.gramHits(
        graft.functions.Shingles.wordShingles(col(textCol), n), bloomBytes) > 0)
    flagContaminated(candidates, eval, idCol, textCol, n, minMatches)
  }

  /** Build the eval-side gram Bloom filter once (two Spark jobs over
    * the BOUNDED eval side: a count to size it, one aggregation for
    * the bits) and return the serialized bytes — megabytes of driver
    * metadata, reusable across any number of probe plans, persistable
    * next to the benchmark it summarizes. The streaming gate
    * ([[graft.streaming.EventStreams.flagContaminatedArrivals]])
    * consumes the same bytes. */
  def buildEvalBloom(eval: DataFrame, textCol: String,
                     n: Int, fpp: Double = 1e-3): Array[Byte] = {
    val evalGrams = eval
      .select(explode(graft.functions.Shingles.wordShingles(col(textCol), n)).as("gram"))
      .distinct()
    val bloom = evalGrams.stat.bloomFilter("gram", math.max(evalGrams.count(), 1L), fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }

  /**
   * Corpus-level duplication score per document: the fraction of a
   * document's distinct word n-grams that occur in at least one OTHER
   * document — the "duplicate n-gram fraction" quality signal used by
   * web-corpus pipelines (RefinedWeb-style) to down-weight boilerplate
   * and template text.
   *
   * Scale: the gram-frequency aggregation and the join back are the
   * inherent shuffles of any corpus-frequency statistic, both on the
   * uniformly-distributed gram key (AQE-skew-safe). The join carries
   * only the grams that ARE duplicated (typically a small minority),
   * not every gram's count: duplicated-ness is resolved by a left
   * semi-style mark, so unique grams — the bulk — never ride the
   * second shuffle's build side.
   */
  def duplicateGramFraction(df: DataFrame, idCol: String, textCol: String,
                            n: Int = 3): DataFrame = {
    val grams = df.select(col(idCol),
      explode(graft.functions.Shingles.wordShingles(col(textCol), n)).as("gram"))
    // arrays are per-doc distinct, so count(*) per gram = doc frequency
    val dupGrams = grams.groupBy("gram").agg(count(lit(1)).as("_df"))
      .filter(col("_df") >= 2)
      .select(col("gram"), lit(1).as("_isdup"))
    grams.join(dupGrams, Seq("gram"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        count(col("_isdup")).as("n_dup_grams"))
      .withColumn("dup_fraction", col("n_dup_grams") / col("n_grams"))
  }
}
