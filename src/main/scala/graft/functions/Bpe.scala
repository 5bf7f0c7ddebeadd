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

  /** `merges` applied sequentially in order; returns the framed
    * token string (feed [[tokens]] / [[nTokens]] to read it). */
  def encodeFramed(w: Column, merges: Seq[String]): Column = {
    require(merges.forall(_.length == 2),
      s"initial-state merge pairs are two chars each: ${merges.filter(_.length != 2)}")
    require(merges.forall(!_.contains(Sep)),
      "a merge pair containing the frame separator would corrupt token boundaries")
    val bb = Sep + Sep
    merges.foldLeft(frame(w))((acc, m) =>
      replace(acc,
        lit(Sep + m.substring(0, 1) + bb + m.substring(1, 2) + Sep),
        lit(Sep + m + Sep)))
  }

  /** Space-joined token rendering of a framed encode. */
  def tokens(framed: Column): Column =
    trim(replace(framed, lit(Sep + Sep), lit(" ")))

  /** Token count of a framed encode (boundaries minus one). */
  def nTokens(framed: Column): Column =
    ((length(framed) - length(replace(framed, lit(Sep), lit(""))))
      .divide(2).cast("long") - 1)
}
