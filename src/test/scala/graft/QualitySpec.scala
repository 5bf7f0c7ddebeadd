package graft

import graft.operators.{IncrementalAgg, Quality}
import org.apache.spark.sql.functions._

/** Data-quality rule engine + HLL distinct maintenance. */
class QualitySpec extends SparkTestBase {
  import spark.implicits._

  test("Bpe.encodeFramed equals reference greedy BPE, incl. overlap and prefix traps") {
    import spark.implicits._
    import graft.functions.Bpe
    // reference greedy BPE over a token list: apply each merge fully,
    // left-to-right non-overlapping, before the next merge
    def ref(w: String, merges: Seq[String]): Seq[String] =
      merges.foldLeft(w.map(_.toString): Seq[String]) { (toks, m) =>
        val (x, y) = (m.substring(0, 1), m.substring(1, 2))
        val out = scala.collection.mutable.ListBuffer.empty[String]
        var i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == x && toks(i + 1) == y) {
            out += m; i += 2
          } else { out += toks(i); i += 1 }
        }
        out.toSeq
      }
    // traps: 'aaa'/'aaaa' (overlap), 'abc' with [bc, ab] (prefix
    // false-match: after bc merges, ab must NOT fire on a|bc), chained
    // merges, a word untouched by any merge
    val merges = Seq("bc", "ab", "aa")
    val words = Seq("aaa", "aaaa", "abc", "abcbc", "ababab", "xyz", "aabc", "ab")
    val got = words.toDF("w")
      .select(col("w"), Bpe.tokens(Bpe.encodeFramed(col("w"), merges)).as("enc"),
        Bpe.nTokens(Bpe.encodeFramed(col("w"), merges)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    words.foreach { w =>
      val want = ref(w, merges)
      assert(got(w) == ((want.mkString(" "), want.length.toLong)),
        s"$w: got ${got(w)}, want $want")
    }
    // the traps actually bite: 'aaa' -> [aa, a], 'abc' -> [a, bc]
    assert(got("aaa")._1 == "aa a" && got("abc")._1 == "a bc")
  }

  test("Bpe.trainMerges runs select->apply->recount with multi-char merges and early stop") {
    import graft.functions.Bpe
    // hand-traced fixture: freq-weighted pair counts force the table
    // to go multi-char by round 2 and exhaust after 4 merges
    //   round 1: (a,b) 9 > (b,a) 6            -> merge (a, b)
    //   round 2: abab=[ab,ab] -> (ab,ab) 3    -> merge (ab, ab)
    //   round 3: (ab,a) 2                     -> merge (ab, a)
    //   round 4: (b,ab) 1                     -> merge (b, ab)
    //   round 5: every word is ONE token      -> early stop
    val vocab = Seq(("abab", 3L), ("aba", 2L), ("bab", 1L)).toDF("w", "freq")
    val merges = Bpe.trainMerges(vocab, "w", "freq", rounds = 10)
    assert(merges === Seq(("a", "b", 9L), ("ab", "ab", 3L),
      ("ab", "a", 2L), ("b", "ab", 1L)))
    // the trained multi-char table round-trips through encodeMerges
    val enc = Seq("abab", "aba", "bab", "abba").toDF("w")
      .select(col("w"), Bpe.tokens(Bpe.encodeMerges(col("w"),
        merges.map(m => (m._1, m._2)))).as("t"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(enc("abab") == "abab" && enc("aba") == "aba" && enc("bab") == "bab")
    // 'abba': merge 1 makes [ab, b, a]; no later merge matches
    assert(enc("abba") == "ab b a")
  }

  test("rules evaluate against hand-built fixtures, one agg pass") {
    val df = Seq(
      (1L, Some("a"), Some(5.0)),
      (2L, Some("b"), Some(50.0)),
      (3L, None, Some(500.0)),      // null name
      (4L, Some("b"), None)          // dup name, null value
    ).toDF("id", "name", "v")
    val out = Quality.check(df, Seq(
        Quality.NotNull("name", maxNullFrac = 0.3),  // 1/4 = 0.25 <= 0.3: pass
        Quality.NotNull("name"),                      // 0.25 > 0.0: fail
        Quality.Unique("id"),                         // pass
        Quality.Unique("name"),                       // b twice: fail
        Quality.InRange("v", 0.0, 100.0, minFrac = 0.6), // 2/3 ≈ 0.67: pass
        Quality.MatchesRegex("name", "^[a-z]$"),      // all single lower: pass
        Quality.RowCountBetween(4, 4)))               // pass
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getBoolean(4)))
    val byKey = out.groupBy(t => (t._1, t._2)).view.mapValues(_.toSeq).toMap
    assert(byKey(("not_null", "name")).map(_._4).sorted == Seq(false, true))
    assert(byKey(("unique", "id")).head._4)
    assert(!byKey(("unique", "name")).head._4)
    val inR = byKey(("in_range", "v")).head
    assert(inR._4 && math.abs(inR._3 - 2.0 / 3.0) < 1e-15)
    assert(byKey(("regex", "name")).head._4)
    assert(byKey(("row_count", "*")).head._4 && byKey(("row_count", "*")).head._3 == 4.0)
    assert(!Quality.allPass(df, Seq(Quality.Unique("name"))))
    assert(Quality.allPass(df, Seq(Quality.Unique("id"))))
  }

  test("empty input: fraction rules pass trivially, row_count can fail") {
    val empty = Seq.empty[(Long, String)].toDF("id", "name")
    val out = Quality.check(empty, Seq(
        Quality.NotNull("name"), Quality.Unique("id"),
        Quality.InRange("id", 0, 1), Quality.RowCountBetween(1, 10)))
      .collect().map(r => (r.getString(0), r.getBoolean(4))).toMap
    assert(out("not_null") && out("unique") && out("in_range"))
    assert(!out("row_count"))
  }

  test("parseRules DSL: fields trim, regex pattern keeps one cosmetic space rule") {
    val rules = Quality.parseRules(
      "not_null: name , 0.3 ; regex: name , 1.0, ^[a-z]+$ ; row_count: 1 , 10")
    assert(rules(0) == Quality.NotNull("name", 0.3))
    // spaced and unspaced regex declarations parse identically — only
    // the single cosmetic space after the comma is stripped (the
    // rule-level trim already removed the trailing space before ';')
    assert(rules(1) == Quality.MatchesRegex("name", "^[a-z]+$", 1.0))
    assert(Quality.parseRules("regex:c,1.0, ^[A-Z]+$") ==
      Quality.parseRules("regex:c,1.0,^[A-Z]+$"))
    // a pattern whose OWN leading space matters keeps the rest intact:
    // 'regex:c,1.0,  x' (two spaces) yields pattern ' x'
    assert(Quality.parseRules("regex:c,1.0,  x").head ==
      Quality.MatchesRegex("c", " x", 1.0))
    assert(rules(2) == Quality.RowCountBetween(1, 10))
  }

  test("all rules compile into a single aggregation (one scan)") {
    val df = Tables.t(spark, sf, "customer")
    val plan = Quality.check(df, Seq(
        Quality.NotNull("c_name"), Quality.Unique("c_custkey"),
        Quality.InRange("c_acctbal", 0, 10000, 0.5),
        Quality.RowCountBetween(1, 1000000)))
      .queryExecution.optimizedPlan.toString()
    // exactly one scan of the table in the optimized plan
    val scans = "Relation".r.findAllIn(plan).size
    assert(scans == 1, s"expected 1 scan, plan:\n$plan")
  }

  test("HLL distinct maintenance: merge equals one-shot sketch, near-exact estimate") {
    val o = Tables.t(spark, sf, "orders")
    val base = o.filter(col("o_orderkey") % 10 =!= 0)
    val delta = o.filter(col("o_orderkey") % 10 === 0)
    val merged = IncrementalAgg.estimateDistinct(IncrementalAgg.mergeDistinct(
        IncrementalAgg.summarizeDistinct(base, Seq("o_orderstatus"), col("o_custkey")),
        IncrementalAgg.summarizeDistinct(delta, Seq("o_orderstatus"), col("o_custkey")),
        Seq("o_orderstatus")))
      .select("o_orderstatus", "distinct_estimate")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val oneShot = IncrementalAgg.estimateDistinct(
        IncrementalAgg.summarizeDistinct(o, Seq("o_orderstatus"), col("o_custkey")))
      .select("o_orderstatus", "distinct_estimate")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == oneShot,
      s"sketch merge must equal sketching the union: $merged vs $oneShot")
    val exact = o.groupBy("o_orderstatus").agg(countDistinct("o_custkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 5% ≈ 6 sigma at lgK=14 (rsd 0.81%): robust to data regeneration
    exact.foreach { case (k, n) =>
      assert(math.abs(merged(k) - n) <= math.max(1L, (n * 0.05).toLong),
        s"$k: estimate ${merged(k)} drifts >5% from exact $n")
    }
  }
}
