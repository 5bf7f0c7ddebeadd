package graft

import org.apache.spark.sql.functions._

/**
 * Pins the unigram-LM trainer's Viterbi kernel on hand-computed
 * fixtures (the gate pins the full EM loop against the DuckDB
 * recursion at sf0.001/sf0.01): max-sum correctness, the
 * longest-piece tie-break, the missing-piece floor, and the trainer's
 * char-coverage invariant.
 */
class UnigramSpec extends SparkTestBase {
  import spark.implicits._
  import graft.functions.Unigram

  private def segment(w: String, scores: Map[String, Long]): Seq[String] = {
    val df = Seq(w).toDF("w")
      .withColumn("_dp", Unigram.viterbiDp(col("w"), scores))
      .withColumn("_ps", Unigram.viterbiPieces(col("w"), col("_dp"), scores))
    df.select("_ps").head().getSeq[String](0).toSeq
  }

  test("viterbi picks the higher-probability composite path") {
    // "ab" at -1e6 beats char-by-char at -2e6 each: abab -> [ab, ab]
    val scores = Map("a" -> -2000000L, "b" -> -2000000L, "ab" -> -1000000L)
    assert(segment("abab", scores).sorted === Seq("ab", "ab"))
    // drop "ab" below two chars and the char path wins
    val scores2 = Map("a" -> -2000000L, "b" -> -2000000L, "ab" -> -5000000L)
    assert(segment("abab", scores2).sorted === Seq("a", "a", "b", "b"))
  }

  test("exact ties break toward the LONGEST piece") {
    // "aa" = -2e6 equals "a"+"a" = -2e6: the k=2 piece must win
    val scores = Map("a" -> -1000000L, "aa" -> -2000000L)
    assert(segment("aa", scores) === Seq("aa"))
  }

  test("missing chars ride the -1e12 floor, never crash") {
    // "x" is not in the piece set: the path exists (floor-scored)
    val scores = Map("a" -> -1000000L)
    assert(segment("xa", scores).sorted === Seq("a", "x"))
  }

  test("piece-table ceiling guard fires loudly past MaxPieces") {
    // the typedLit score map embeds in the plan 8 times across the two
    // Viterbi folds — past MaxPieces the right form is the broadcast-
    // join segmentation, and the guard must say so instead of letting
    // the task binary grow silently (VERDICT r16 #3)
    val oversized = (0 to Unigram.MaxPieces)
      .map(i => f"p$i%05d" -> -1000000L).toMap
    val e = intercept[IllegalArgumentException] {
      Unigram.viterbiDp(col("w"), oversized)
    }
    assert(e.getMessage.contains("typedLit"))
    assert(e.getMessage.contains("broadcast-join"))
    // at the ceiling itself the embedding is still allowed
    val atCap = (1 to Unigram.MaxPieces).map(i => f"p$i%05d" -> -1000000L).toMap
    Unigram.viterbiDp(col("w"), atCap) // must not throw
  }

  test("segmentJoined is bit-identical to the typedLit Viterbi, with no piece ceiling") {
    // same candidates, floors, max-sum, and longest-piece tie-break —
    // on the hand fixtures AND under a piece table PAST MaxPieces,
    // where the typedLit form refuses and the join form must serve
    def joined(w: String, scores: Map[String, Long]): Seq[String] = {
      val pieceDf = scores.toSeq.toDF("piece", "score_micros")
      Unigram.segmentJoined(Seq(w).toDF("w"), "w", pieceDf)
        .select("_pieces").head().getSeq[String](0).toSeq
    }
    val fixtures = Seq(
      Map("a" -> -2000000L, "b" -> -2000000L, "ab" -> -1000000L),   // composite wins
      Map("a" -> -2000000L, "b" -> -2000000L, "ab" -> -5000000L),   // chars win
      Map("a" -> -1000000L, "b" -> -1000000L, "ab" -> -2000000L),   // exact tie -> longest
      Map("a" -> -1000000L))                                        // missing chars ride Neg
    for (scores <- fixtures; w <- Seq("abab", "ab", "ba", "aaab"))
      assert(joined(w, scores) === segment(w, scores),
        s"divergence on w=$w scores=$scores")
    // past the ceiling: typedLit refuses, the join form serves the
    // same segmentation the small-table typedLit form computes
    val big = (0 to Unigram.MaxPieces).map(i => f"p$i%05d" -> -3000000L).toMap ++
      Map("a" -> -2000000L, "b" -> -2000000L, "ab" -> -1000000L)
    intercept[IllegalArgumentException] { Unigram.viterbiDp(col("w"), big) }
    assert(joined("abab", big) === segment("abab",
      Map("a" -> -2000000L, "b" -> -2000000L, "ab" -> -1000000L)))
  }

  test("segmentJoined: a zero-length word emits no spurious spans — " +
    "null map, EMPTY pieces (ADVICE r17: sequence(1, 0) is [1, 0])") {
    val pieceDf = Seq(("a", -1000000L)).toDF("piece", "score_micros")
    val out = Unigram.segmentJoined(
        Seq("", "a", "aa").toDF("w"), "w", pieceDf)
      .select("w", "_pieces").collect()
      .map(r => r.getString(0) -> Option(r.getSeq[String](1)).map(_.toSeq))
      .toMap
    // empty word: EMPTY pieces array (backtrace starts at pos = 0),
    // never null and never garbage i=0/i=1 span rows
    assert(out("") === Some(Seq.empty[String]),
      s"empty word must segment to empty pieces, got ${out("")}")
    assert(out("a") === Some(Seq("a")))
    assert(out("aa") === Some(Seq("a", "a")))
  }

  test("trainUnigram keeps every char and emits integer-micro scores") {
    val vocab = Seq(("abab", 10L), ("abba", 5L), ("baba", 3L), ("bb", 2L))
      .toDF("w", "freq")
    val out = Unigram.trainUnigram(vocab, "w", "freq",
      rounds = 2, seedMulti = 4, keepMulti = 3).collect()
    val pieces = out.map(_.getString(0)).toSet
    assert(Set("a", "b").subsetOf(pieces), s"chars missing from $pieces")
    assert(out.forall(_.getLong(2) < 0L), "log-prob micros must be negative")
    // counts conserve the segmentation mass: every word fully covered
    val totalChars = 4 * 10 + 4 * 5 + 4 * 3 + 2 * 2
    val coveredChars = out.map(r => r.getString(0).length * r.getLong(1)).sum
    assert(coveredChars === totalChars.toLong,
      s"piece counts x lengths must tile the corpus: $coveredChars vs $totalChars")
  }
}
