package graft

import graft.functions.{BloomProbe, Shingles}
import graft.operators.Contamination
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-pruned decontamination: prune-then-exact-verify must be
  * indistinguishable from the exact operator, and the probe expression
  * must be put-compatible with how the filter was built. */
class BloomDecontaminationSpec extends SparkTestBase {

  private lazy val docs =
    Tables.t(spark, sf, "documents").select("doc_id", "text")
  private lazy val train = docs.filter(col("doc_id") % 25 =!= 0)
  private lazy val eval_ = docs.filter(col("doc_id") % 25 === 0)

  test("bloom-pruned result is identical to the exact operator") {
    val exact = Contamination
      .flagContaminated(train, eval_, "doc_id", "text", n = 4)
      .orderBy("doc_id").collect().toSeq
    val bloomed = Contamination
      .flagContaminatedBloom(train, eval_, "doc_id", "text", n = 4)
      .orderBy("doc_id").collect().toSeq
    assert(exact.nonEmpty, "fixture must actually contain contamination")
    assert(bloomed == exact)
  }

  test("reusable filter handle: build once, many lazy probe plans, same result") {
    val bytes = Contamination.buildEvalBloom(eval_, "text", n = 4)
    // constructing the probe plan from prebuilt bytes must run NO jobs
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val planA = Contamination.flagContaminatedBloom(
      train, eval_, "doc_id", "text", bytes, n = 4, minMatches = 1)
    val planB = Contamination.flagContaminatedBloom(
      train, eval_, "doc_id", "text", bytes, n = 4, minMatches = 1)
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after == before, "lazy overload must not run jobs at plan construction")
    val exact = Contamination
      .flagContaminated(train, eval_, "doc_id", "text", n = 4)
      .orderBy("doc_id").collect().toSeq
    assert(planA.orderBy("doc_id").collect().toSeq == exact)
    assert(planB.orderBy("doc_id").collect().toSeq == exact)
  }

  test("probe has no false negatives (put/probe hashing compatible)") {
    // build over every eval gram, probe each doc's own grams: a doc
    // made only of eval grams must count ALL of them as hits
    val grams = eval_.select(
      Shingles.wordShingles(col("text"), 4).as("grams"),
      size(Shingles.wordShingles(col("text"), 4)).as("n"))
    val evalGrams = eval_
      .select(explode(Shingles.wordShingles(col("text"), 4)).as("gram"))
      .distinct()
    val bloom = evalGrams.stat.bloomFilter("gram", evalGrams.count(), 1e-3)
    val bytes = { val b = new java.io.ByteArrayOutputStream(); bloom.writeTo(b); b.toByteArray }
    val missed = grams
      .select((col("n") - BloomProbe.gramHits(col("grams"), bytes)).as("missed"))
      .agg(sum("missed")).head.getLong(0)
    assert(missed == 0L, s"bloom missed $missed grams that were put")
  }

  test("probe prunes: candidate set is a small superset of contaminated docs") {
    val evalGrams = eval_
      .select(explode(Shingles.wordShingles(col("text"), 4)).as("gram"))
      .distinct()
    val bloom = evalGrams.stat.bloomFilter("gram", evalGrams.count(), 1e-3)
    val bytes = { val b = new java.io.ByteArrayOutputStream(); bloom.writeTo(b); b.toByteArray }
    val nTrain = train.count()
    val nCandidates = train.filter(
      BloomProbe.gramHits(Shingles.wordShingles(col("text"), 4), bytes) > 0).count()
    val nContaminated = Contamination
      .flagContaminated(train, eval_, "doc_id", "text", n = 4).count()
    assert(nCandidates >= nContaminated, "bloom may never lose a true candidate")
    // the prune must do real work: candidates a small fraction of train
    assert(nCandidates < nTrain / 2,
      s"bloom pruned nothing: $nCandidates candidates of $nTrain train docs")
  }

  test("probe expression evaluates identically interpreted and codegen'd") {
    val bloom = BloomFilter.create(100, 1e-3)
    Seq("a b c d", "x y z w").foreach(bloom.putString)
    val bytes = { val b = new java.io.ByteArrayOutputStream(); bloom.writeTo(b); b.toByteArray }
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a b c d", "q r s t")),      // 1 hit
      (2L, Seq("x y z w", "a b c d")),      // 2 hits
      (3L, Seq("none here", "also none")),  // 0 hits (w.h.p.)
      (4L, Seq.empty[String])
    ).toDF("id", "grams")
    val hits = df.select(col("id"), BloomProbe.gramHits(col("grams"), bytes).as("h"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(hits(0) == (1L, 1) && hits(1) == (2L, 2) && hits(3) == (4L, 0))
    assert(hits(2)._2 == 0, "false positive on a 100-capacity filter is ~impossible")
  }
}
