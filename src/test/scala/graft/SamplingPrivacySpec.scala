package graft

import graft.operators.{Privacy, Sampling}
import org.apache.spark.sql.functions._

/** Dataset-assembly operators: split determinism/coverage, packing
  * invariants, PII scrub semantics. */
class SamplingPrivacySpec extends SparkTestBase {
  import spark.implicits._

  test("hashSplit (xxhash64 default): total coverage, determinism, weight proportions") {
    val docs = Tables.t(spark, sf, "documents").select("doc_id")
    val split = Sampling.hashSplit(docs, "doc_id", Seq("train" -> 80, "val" -> 10, "test" -> 10))
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum
    assert(counts.keySet == Set("train", "val", "test"), s"missing splits: $counts")
    assert(n == docs.count(), "every row must land in exactly one split")
    // proportions within loose tolerance (xxhash64 is uniform)
    assert(math.abs(counts("train").toDouble / n - 0.8) < 0.08, s"train skewed: $counts")
    // determinism: recompute == original membership
    val again = Sampling.hashSplit(docs, "doc_id", Seq("train" -> 80, "val" -> 10, "test" -> 10))
    assert(split.select("doc_id", "split").except(again.select("doc_id", "split")).isEmpty)
  }

  test("packSequences: bins fill in order and never overflow by more than one doc") {
    val docs = Tables.t(spark, sf, "documents").select("doc_id", "text")
    val budget = 2048
    val packed = Sampling.packSequences(docs, "doc_id",
      size(split(col("text"), " ")), pmod(col("doc_id"), lit(4L)), budget)
    val rows = packed.select("pack_shard", "bin", "n_tokens", "doc_id")
      .orderBy("pack_shard", "doc_id").collect()
    // per (shard, bin): total tokens < budget + last doc's tokens
    // (a doc is assigned where its run starts)
    rows.groupBy(r => (r.getLong(0), r.getLong(1))).foreach { case ((shard, bin), rs) =>
      val toks = rs.map(_.getInt(2))
      assert(toks.sum - toks.last < budget,
        s"shard=$shard bin=$bin starts past budget: ${toks.mkString(",")}")
    }
    // bins are contiguous from 0 within each shard
    rows.groupBy(_.getLong(0)).foreach { case (shard, rs) =>
      val bins = rs.map(_.getLong(1)).distinct.sorted.toVector
      assert(bins == (0L until bins.length).toVector,
        s"shard=$shard bins not contiguous: ${bins.mkString(",")}")
    }
  }

  test("scrubPii replaces emails, phones, and id runs; leaves prose alone") {
    val out = Seq(
      "write to jane.doe+x@sub.example.org today",
      "call 555-867-5309 or 555 1234 5678 now",
      "order 123456789 shipped; pin 12345 stays",
      "no pii here at all").toDF("t")
      .select(Privacy.scrubPii(col("t")).as("s")).as[String].collect()
    assert(out(0) == "write to [EMAIL] today")
    assert(out(1) == "call [PHONE] or [PHONE] now")
    assert(out(2) == "order [ID] shipped; pin 12345 stays") // <6 digits kept
    assert(out(3) == "no pii here at all")
  }

  test("piiCounts audit matches what scrub would replace") {
    val (e, p, i) = Privacy.piiCounts(col("t"))
    val r = Seq("a@b.co and c@d.org, 555-123-4567, ref 9999999")
      .toDF("t").select(e.as("e"), p.as("p"), i.as("i")).collect()(0)
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) == ((2, 1, 1)))
  }

  test("stratifiedSample (xxhash64 default): rare strata kept whole, dominant downsampled, deterministic") {
    val docs = Tables.t(spark, sf, "documents").select("doc_id", "lang")
    val kept = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 40), defaultPct = 100)
    val byLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keptByLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byLang.keys.filter(_ != "en").foreach { l =>
      assert(keptByLang(l) == byLang(l), s"non-en stratum $l must be kept whole")
    }
    val enFrac = keptByLang("en").toDouble / byLang("en")
    assert(math.abs(enFrac - 0.4) < 0.12, s"en kept fraction $enFrac not ~0.4")
    val again = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 40), defaultPct = 100)
    assert(kept.select("doc_id").except(again.select("doc_id")).isEmpty)
  }

  test("stratifiedCap: no stratum exceeds the cap; full strata survive untouched") {
    val docs = Tables.t(spark, sf, "documents").select("doc_id", "lang")
    val capped = Sampling.stratifiedCap(docs, "doc_id", "lang", cap = 30)
    val counts = capped.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = Tables.t(spark, sf, "documents").groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.foreach { case (l, n) =>
      assert(n == math.min(30L, full(l)), s"stratum $l: got $n of ${full(l)} with cap 30")
    }
  }

  test("deterministicShuffle: positions are a permutation matching the (bucket, id) order") {
    val docs = Tables.t(spark, sf, "documents").select("doc_id")
    val shuffled = Sampling.deterministicShuffle(docs, "doc_id", buckets = 16)
    val rows = shuffled.select("shuffle_bucket", "doc_id", "shuffle_pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = docs.count()
    assert(rows.map(_._3).sorted.toSeq == (0L until n).toSeq, "positions must be 0..n-1 exactly")
    // position order == lexicographic (bucket, id) order
    assert(rows.sortBy(_._3).toSeq == rows.sortBy(r => (r._1, r._2)).toSeq)
  }

  test("tokenBudgetCap: membership matches the naive global running sum; budget never exceeded") {
    // skewed strata: one dominant domain, one tiny, one exactly at
    // budget; token counts vary so the cut falls mid-bucket
    val rows = (1L to 400L).map(i => (i, if (i % 7 == 0) "small" else "big", 10L + i % 37)) ++
      Seq((1000L, "exact", 50L), (1001L, "exact", 50L))
    val df = rows.toDF("doc_id", "s", "toks")
    val budget = 1000L
    val capped = Sampling.tokenBudgetCap(df, "doc_id", "s", "toks", budget, buckets = 8)
    // naive oracle: global inclusive running sum in (bucket, id) order
    val bkt = pmod(xxhash64(col("doc_id"), lit(42L)), lit(8))
    val naive = df.withColumn("_b", bkt)
      .withColumn("cum", sum(col("toks")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("s")
          .orderBy("_b", "doc_id").rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .filter(col("cum") <= budget)
    assert(capped.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      naive.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
    // per-stratum spend stays within budget; the at-budget stratum is kept whole
    val spend = capped.groupBy("s").agg(sum("toks").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(spend.values.forall(_ <= budget), s"budget exceeded: $spend")
    assert(spend("exact") == 100L, "a stratum within budget must be kept whole")
    // deterministic
    assert(capped.count() == Sampling.tokenBudgetCap(
      df, "doc_id", "s", "toks", budget, buckets = 8).count())
  }

  test("tokenBudgetCap: a nullable bucketExpr never drops rows; null bucket charged first") {
    val df = Seq((1L, "a", 10L, Some(0L)), (2L, "a", 10L, None),
      (3L, "a", 10L, Some(1L)), (4L, "a", 10L, None))
      .toDF("doc_id", "s", "toks", "shard")
    // budget admits everything: every row must survive, null shard included
    val all = Sampling.tokenBudgetCap(df, "doc_id", "s", "toks", 1000L,
      bucketExpr = Some(col("shard")))
    assert(all.count() == 4, "null-bucket rows must not be dropped")
    // budget of 20: the null bucket (docs 2, 4) sorts first and spends
    // the budget before buckets 0 and 1 see any
    val tight = Sampling.tokenBudgetCap(df, "doc_id", "s", "toks", 20L,
      bucketExpr = Some(col("shard")))
    assert(tight.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 4L))
  }

  test("weightedMix: integer epochs exact, fractional epochs in expectation, zero drops, deterministic") {
    val docs = Tables.t(spark, sf, "documents").select("doc_id", "lang")
    val weights = when(col("lang") === "en", 2500L)   // 2.5 epochs
      .when(col("lang") === "zh", 1000L)              // exactly 1
      .when(col("lang") === "es", 0L)                 // blocked
      .otherwise(400L)                                // keep 40%
    val mixed = Sampling.weightedMix(docs, "doc_id", weights)
    val perDoc = mixed.groupBy("doc_id", "lang").count().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // en docs appear 2 or 3 times, ~half each; zh exactly once; es never
    val en = perDoc.filter(_._2 == "en")
    assert(en.forall(d => d._3 == 2L || d._3 == 3L), "en multiplicity must be 2 or 3")
    val frac3 = en.count(_._3 == 3L).toDouble / en.length
    assert(math.abs(frac3 - 0.5) < 0.15, s"en 3-copy fraction $frac3 not ~0.5")
    assert(perDoc.filter(_._2 == "zh").forall(_._3 == 1L), "zh must appear exactly once")
    assert(!perDoc.exists(_._2 == "es"), "es (weight 0) must be dropped")
    val nEs = docs.filter(col("lang") === "es").count()
    assert(nEs > 0, "fixture must actually contain es docs")
    // other langs kept at ~40%, one copy each
    val others = perDoc.filter(d => d._2 != "en" && d._2 != "zh")
    assert(others.forall(_._3 == 1L))
    val nOtherTotal = docs.filter(!col("lang").isin("en", "zh", "es")).count()
    assert(math.abs(others.length.toDouble / nOtherTotal - 0.4) < 0.15)
    // replica indices are contiguous 0..reps-1; recompute is identical
    val reps = mixed.groupBy("doc_id").agg(
      count(lit(1)).as("n"), max("mix_rep").as("mx"), min("mix_rep").as("mn"))
    assert(reps.filter(col("mx") =!= col("n") - 1 || col("mn") =!= 0).isEmpty)
    val again = Sampling.weightedMix(docs, "doc_id", weights)
    assert(mixed.select("doc_id", "mix_rep").except(again.select("doc_id", "mix_rep")).isEmpty)
  }

  test("chunkDocuments: overlapping windows cover every token; last chunk may be short") {
    val docs = Seq(
      (1L, (1 to 80).map(i => s"t$i").mkString(" ")),  // 80 tokens -> starts 1,25,49,73
      (2L, "just five little tokens here"),            // 5 tokens -> one short chunk
      (3L, "")                                         // one empty token -> one chunk
    ).toDF("doc_id", "text")
    val chunks = Sampling.chunkDocuments(docs, "doc_id", "text", chunkSize = 32, stride = 24)
      .orderBy("doc_id", "chunk_idx").collect()
    val d1 = chunks.filter(_.getLong(0) == 1L)
    assert(d1.map(_.getInt(1)).toSeq == Seq(0, 1, 2, 3))
    assert(d1.map(_.getInt(2)).toSeq == Seq(32, 32, 32, 8))
    assert(d1(0).getString(3).startsWith("t1 t2 ") && d1(3).getString(3).endsWith("t80"))
    // consecutive chunks overlap by chunkSize - stride tokens
    assert(d1(0).getString(3).split(" ").drop(24).toSeq ==
      d1(1).getString(3).split(" ").take(8).toSeq)
    assert(chunks.filter(_.getLong(0) == 2L).map(r => (r.getInt(1), r.getInt(2))).toSeq ==
      Seq((0, 5)))
    assert(chunks.filter(_.getLong(0) == 3L).length == 1)
  }

  test("duplicateGramFraction: shared grams counted against each holder, unique-only docs at 0") {
    import graft.operators.Contamination
    val docs = Seq(
      (1L, "alpha beta gamma delta"),     // grams: [a b g], [b g d] — both shared with doc 2
      (2L, "alpha beta gamma delta end"), // 3 grams, first two shared with doc 1
      (3L, "totally different words here")// 2 grams, unique
    ).toDF("doc_id", "text")
    val got = Contamination.duplicateGramFraction(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((2L, 2L, 1.0)))
    assert(got(2L) == ((3L, 2L, 2.0 / 3.0)))
    assert(got(3L) == ((2L, 0L, 0.0)))
  }

  test("flagContaminated finds planted n-gram overlap and nothing else") {
    import graft.operators.Contamination
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),     // contains eval 4-gram
      (2L, "one two three four five six seven"),       // clean
      (3L, "beta gamma delta epsilon end of doc")      // same planted 4-gram
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "prefix beta gamma delta epsilon suffix")).toDF("doc_id", "text")
    val flagged = Contamination.flagContaminated(train, eval, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged == Map(1L -> 1L, 3L -> 1L), s"got $flagged")
  }
}
