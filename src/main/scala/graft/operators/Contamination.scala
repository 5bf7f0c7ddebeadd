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
