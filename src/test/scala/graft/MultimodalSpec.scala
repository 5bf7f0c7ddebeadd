package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("feature extraction is deterministic and schema-correct") {
    val out = Multimodal.documentFeatures(spark, sf)
    assert(out.schema.fieldNames.toSeq ==
      Seq("media_id", "modality", "n_bytes", "checksum", "feature"))
    val rows = out.orderBy("media_id").collect()
    assert(rows.length == 500)
    // n_bytes matches the source text byte length
    val expect = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), octet_length(col("text")).as("n"))
      .orderBy("doc_id").collect()
    rows.zip(expect).foreach { case (got, want) =>
      assert(got.getAs[Long]("media_id") == want.getLong(0))
      assert(got.getAs[Int]("n_bytes") == want.getInt(1))
      assert(got.getAs[Seq[Float]]("feature").sum.toInt == want.getInt(1)) // histogram sums to byte count
    }
  }

  test("batching bounds batch size and loses no rows") {
    val media = Multimodal.asMedia(
      Seq((1L, Array[Byte](1, 2, 3)), (2L, Array[Byte](4)), (3L, Array[Byte]()))
        .toDF("id", "payload"), "id", "payload", "bin")
      .repartition(1)
    val out = Multimodal.extractFeatures(media, batchSize = 2).collect()
    assert(out.map(_.media_id).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(out.find(_.media_id == 3L).get.n_bytes == 0)
  }
}
