package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch stage profiler for the minhash pipeline (dev-only). */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.Tables

    def time(label: String)(f: => DataFrame): Unit = {
      // warm once, then 3 timed
      f.write.format("noop").mode("overwrite").save()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] $label%-28s median ${ts.sorted.apply(1)}%.3f s  (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    val docs = Tables.t(spark, sfDir, "documents")
    val spine = docs
      .select(col("doc_id"), graft.functions.Shingles.wordShingles(col("text"), 3).as("_sh"))
      .filter(size(col("_sh")) > 0)

    println("docs=" + docs.count() + " shingleRows=" + spine.select(explode(col("_sh"))).count())

    time("spine (shingle arrays)") { spine }
    val sh = spine.select(col("doc_id"), explode(col("_sh")).as("shingle"))
    time("explode shingles") { sh }
    val mh = graft.operators.Dedup.minhash(sh, "doc_id")
    time("minhash agg (128 min)") { mh }
    val cands = graft.operators.Dedup.lshCandidates(mh, "doc_id")
    time("+ lsh candidates") { cands }
    time("full minhashNearDups") {
      graft.operators.Dedup.minhashNearDups(docs, "doc_id", "text").orderBy("doc_a", "doc_b")
    }
    spark.stop()
  }
}
