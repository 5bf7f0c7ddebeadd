package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Byte-pair-encoding APPLY as a pure column expression — the encode
 * half of tokenizer training (the merge-SELECTION statistic is the
 * `text_bpe_merge_step` query). Given a FIXED merge table (rank-
 * ordered pair strings, each two characters from the initial
 * single-char state), encodes a word column as a chain of plain
 * string `replace`s, entirely inside whole-stage codegen.
 *
 * Representation: tokens are separated by a DOUBLE `sep` boundary
 * (`..xx t xx..` where x = sep), the string starts and ends with a
 * boundary. Applying merge (x, y) is then ONE replace of
 * `<sep>x<sep><sep>y<sep>` with `<sep>xy<sep>`: the pattern consumes
 * one sep of each OUTER boundary and restores it in the replacement,
 * so
 *  - replace()'s left-to-right non-overlapping scan is exactly
 *    greedy BPE ("aaaa" -> [aa, aa], "aaa" -> [aa, a]): the restored
 *    trailing sep lets the next occurrence start at the very next
 *    token, which single-sep framing cannot do;
 *  - the double-boundary invariant is maintained after every merge;
 *  - a token merely PREFIXED by y ("ya…") can never false-match —
 *    the pattern demands y's closing sep.
 * Both Spark's and DuckDB's replace() share these semantics, so the
 * encode is oracle-exact cross-engine.
 *
 * Scale: callers collapse the corpus to its VOCABULARY first (one
 * groupBy) — each distinct word encodes once, map-side; the merge
 * table is the only driver-side piece (top-K rows, exactly what a
 * tokenizer trainer ships to every worker).
 */
object Bpe {
  val Sep = "\u0001"

  /** The double-sep framed initial state: one single-char token per
    * character of `w`. The empty string frames as one empty token
    * (the `greatest` guard — Spark's `sequence(1, 0)` would DESCEND
    * and emit two phantom tokens otherwise); callers conventionally
    * filter to length >= 2 words anyway. */
  def frame(w: Column): Column = {
    val bb = Sep + Sep
    concat(lit(bb), array_join(
      transform(sequence(lit(1), greatest(length(w), lit(1))),
        i => substr(w, i, lit(1))),
      bb), lit(bb))
  }

  /** General merge application: each merge is a (left, right) TOKEN
    * pair — tokens may be MULTI-char (the product of earlier merges),
    * which the double-sep framing supports unchanged: the pattern
    * `<sep>left<sep><sep>right<sep>` -> `<sep>leftright<sep>` is
    * token-boundary-exact whatever the token lengths. This is the
    * entry point [[trainMerges]] grows its table through; the
    * String-typed [[encodeFramed]] remains for fixed 2-char tables. */
  def encodeMerges(w: Column, merges: Seq[(String, String)]): Column = {
    require(merges.forall(m => m._1.nonEmpty && m._2.nonEmpty &&
        !m._1.contains(Sep) && !m._2.contains(Sep)),
      "merge tokens must be non-empty and free of the frame separator")
    val bb = Sep + Sep
    merges.foldLeft(frame(w))((acc, m) =>
      replace(acc,
        lit(Sep + m._1 + bb + m._2 + Sep),
        lit(Sep + m._1 + m._2 + Sep)))
  }

  /** `merges` applied sequentially in order; returns the framed
    * token string (feed [[tokens]] / [[nTokens]] to read it). The
    * 2-char require is on THIS signature only — a pair shipped as one
    * String is ambiguous beyond the initial character state; pass
    * multi-char merges through [[encodeMerges]]' (left, right) form. */
  def encodeFramed(w: Column, merges: Seq[String]): Column = {
    require(merges.forall(_.length == 2),
      s"initial-state merge pairs are two chars each: ${merges.filter(_.length != 2)}")
    encodeMerges(w, merges.map(m => (m.substring(0, 1), m.substring(1, 2))))
  }

  /** Space-joined token rendering of a framed encode. */
  def tokens(framed: Column): Column =
    trim(replace(framed, lit(Sep + Sep), lit(" ")))

  /** Token array of a framed encode. */
  def tokenArray(framed: Column): Column = split(tokens(framed), " ")

  /** Token count of a framed encode (boundaries minus one). */
  def nTokens(framed: Column): Column =
    ((length(framed) - length(replace(framed, lit(Sep), lit(""))))
      .divide(2).cast("long") - 1)

  /**
   * Iterative BPE TRAINER — the k-round select -> apply -> recount
   * loop real tokenizer training runs (the `text_bpe_merge_step`
   * query is only the round-1 statistic): each round re-encodes the
   * vocabulary under the merges selected SO FAR, recounts adjacent
   * TOKEN pairs (weighted by word frequency), picks the max under the
   * total (n DESC, left ASC, right ASC) order, and appends it to the
   * table — so later merges pair MULTI-char tokens ("th"+"e") exactly
   * as the BPE algorithm (Sennrich et al. 2016, public) prescribes.
   *
   * Scale shape: the corpus collapses to its VOCABULARY before the
   * loop (callers pass the (word, freq) table — one corpus groupBy,
   * the only corpus-sized pass); each round is a vocab-sized chain of
   * <= k codegen replaces + one explode + one map-side-combinable
   * (l, r) count, and the only driver transfer per round is ONE row.
   * Total work is O(k² · vocab), m-invariant in corpus replication.
   * Rounds stop early if no adjacent pair remains.
   *
   * Returns (left, right, pair_count_at_selection) in rank order.
   */
  def trainMerges(vocab: org.apache.spark.sql.DataFrame, wCol: String,
                  freqCol: String, rounds: Int): Seq[(String, String, Long)] = {
    // A vocab word containing the frame separator would corrupt frame()'s
    // token boundaries and, once a learned token carried it, abort
    // encodeMerges' require mid-loop with a confusing error — reject such
    // words up front, in-plan (no driver scan; real text never contains
    // U+0001, so the filter is a no-op on clean corpora).
    val clean = vocab.filter(!col(wCol).contains(Sep))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var exhausted = false
    while (!exhausted && merges.size < rounds) {
      val enc = encodeMerges(col(wCol), merges.toSeq.map(m => (m._1, m._2)))
      val best = clean
        .select(col(freqCol).as("_f"), tokenArray(enc).as("_tk"))
        // guard: a fully-merged 1-token word would make
        // sequence(1, 0) DESCEND and index element_at(_tk, 0)
        .filter(size(col("_tk")) >= 2)
        .select(col("_f"), explode(expr(
          "transform(sequence(1, size(_tk) - 1), i -> " +
            "named_struct('l', element_at(_tk, i), 'r', element_at(_tk, i + 1)))")).as("_p"))
        .groupBy(col("_p.l").as("l"), col("_p.r").as("r"))
        .agg(sum("_f").as("n"))
        .orderBy(desc("n"), asc("l"), asc("r"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else merges += ((best(0).getString(0), best(0).getString(1), best(0).getLong(2)))
    }
    merges.toSeq
  }
}
