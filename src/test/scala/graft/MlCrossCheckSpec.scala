package graft

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.functions._

/** Cross-validation against spark.ml's MinHashLSH: the independent
  * implementation must agree with ours on which pairs are near-dups
  * (both are approximations of the same exact-Jaccard ground truth). */
class MlCrossCheckSpec extends SparkTestBase {

  test("spark.ml MinHashLSH finds the same high-similarity pairs as graft's LSH") {
    val docs = Tables.t(spark, sf, "documents")
      .withColumn("words", split(col("text"), " "))
    val tf = new HashingTF().setInputCol("words").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    val feat = tf.transform(docs).filter(expr("aggregate(words, 0, (a, x) -> a + 1) > 0"))
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(16).setSeed(42L)
    val model = lsh.fit(feat)
    // word-set Jaccard distance <= 0.3  ~  similarity >= 0.7
    val mlPairs = model.approxSimilarityJoin(feat, feat, 0.3, "dist")
      .select(col("datasetA.doc_id").as("a"), col("datasetB.doc_id").as("b"))
      .filter(col("a") < col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // ours is 3-gram-shingle Jaccard >= 0.7 — stricter than word-set
    // Jaccard, so every graft pair should be an ml pair (near-dup docs
    // share word sets at least as much as shingle sets)
    val graftPairs = Queries.queries("dedup_minhash_pairs")(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(graftPairs.nonEmpty && mlPairs.nonEmpty)
    val covered = graftPairs.count(mlPairs.contains).toDouble / graftPairs.size
    assert(covered >= 0.9, s"ml found ${(covered * 100).toInt}% of graft's pairs; " +
      s"missing=${graftPairs -- mlPairs}")
  }
}
