package graft

import graft.functions.{HashSketches, Shingles}
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** The compiled sketch kernels must be bit-identical to the SQL
  * formulations they replaced — the MinHash candidate set and the
  * SimHash fingerprints must not shift when the fused expressions
  * take over. */
class HashSketchesSpec extends SparkTestBase {

  private lazy val docs = Tables.t(spark, sf, "documents")

  test("fused minhash band keys equal the SQL minhash + band derivation") {
    val spine = docs
      .select(col("doc_id"), Shingles.wordShingles(col("text"), 3).as("_sh"))
      .filter(size(col("_sh")) > 0)

    val fused = spine.select(col("doc_id"),
        posexplode(HashSketches.minhashBandKeys(col("_sh"), 128, 32))
          .as(Seq("band", "band_key")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

    // the former SQL derivation: explode shingles, 128-column min agg
    // over xxhash64(xxhash64(shingle), i), band key = xxhash64(4 slots)
    val sh = spine.select(col("doc_id"), explode(col("_sh")).as("shingle"))
    val mh = Dedup.minhash(sh, "doc_id")
    val bandKeys = (0 until 32).map { b =>
      val cols = (b * 4 until (b + 1) * 4).map(i => col(s"mh_$i"))
      struct(lit(b).as("band"), xxhash64(cols: _*).as("band_key"))
    }
    val viaSql = mh.select(col("doc_id"), explode(array(bandKeys: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.band_key"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

    assert(fused == viaSql)
    assert(fused.nonEmpty)
  }

  test("fused simhash equals the explode + 64-sum SQL aggregation") {
    import spark.implicits._
    val tricky = Seq(
      (9000001L, "a  b"), (9000002L, ""), (9000003L, "one"),
      (9000004L, "x y z x y z")).toDF("doc_id", "text")
    val corpus = docs.select("doc_id", "text").unionByName(tricky)

    val fused = Dedup.simhash(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val tokens = corpus
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { j =>
      sum(when(expr(s"(h >> $j) & 1") === 1, 1).otherwise(-1)).as(s"b$j")
    }
    val summed = tokens.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val fpCol = (0 until 64)
      .map(j => when(col(s"b$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    val viaSql = summed.select(col("doc_id"), fpCol.as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(fused == viaSql)
    assert(fused.size == viaSql.size && fused.nonEmpty)
  }

  test("null text yields no fingerprint row; empty shingle set yields null band keys") {
    import spark.implicits._
    val corpus = Seq((1L, null: String), (2L, "one two")).toDF("doc_id", "text")
    assert(Dedup.simhash(corpus, "doc_id", "text").count() == 1)
    val bk = corpus.select(
      HashSketches.minhashBandKeys(Shingles.wordShingles(col("text"), 3)).as("k"))
    assert(bk.filter(col("k").isNotNull).count() == 0)
  }
}
