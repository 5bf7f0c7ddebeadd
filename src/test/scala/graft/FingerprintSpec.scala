package graft

import graft.functions.Fingerprint
import org.apache.spark.sql.functions._

/** The custom codegen Expression must agree with a plain Scala
  * reference fold on both the interpreted and codegen paths. */
class FingerprintSpec extends SparkTestBase {
  import spark.implicits._

  private def reference(s: String): Long = {
    var h = 0L
    s.codePoints().forEach(cp => h = (h * 31L + cp) % 1000000007L)
    h
  }

  private val samples = Seq("", "a", "abc", "the quick brown fox",
    "unicode: éß中文", "emoji 😀 pair", "x" * 5000)

  test("codegen path matches the scala reference fold") {
    val got = samples.toDF("t")
      .select(col("t"), Fingerprint.fingerprint(col("t")).as("fp"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    samples.foreach(s => assert(got(s) == reference(s), s"mismatch for '${s.take(20)}'"))
  }

  test("interpreted (no-codegen) path agrees") {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val got = samples.toDF("t")
        .select(Fingerprint.fingerprint(col("t")).as("fp"))
        .collect().map(_.getLong(0)).toSeq
      assert(got == samples.map(reference))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("null propagates") {
    val r = Seq[String](null).toDF("t").select(Fingerprint.fingerprint(col("t"))).collect()
    assert(r(0).isNullAt(0))
  }
}
