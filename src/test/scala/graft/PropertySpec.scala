package graft

import graft.model.{ConnectionDetails, DestinationConfig, FieldMapping}
import graft.sinks.Writers
import graft.sources.Readers
import graft.types.CastEngine
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style tests (SURVEY.md §5.2): generated adversarial data
  * through the real engine paths. One generated corpus per property,
  * one Spark round-trip — not one job per ScalaCheck case. */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private def sample[T](g: Gen[T], n: Int, seed: Long): List[T] =
    Gen.listOfN(n, g)(Gen.Parameters.default, Seed(seed)).get

  test("CSV round-trip preserves arbitrary strings (quotes, delimiters, newlines, unicode)") {
    val nasty = Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.oneOf("a,b", "say \"hi\"", "line1\nline2", "trailing,", ",leading",
        "é中文😀", "\"", ",", "\n", "a\r\nb", "  padded  "),
      Gen.listOfN(5, Gen.oneOf(',', '"', '\n', 'x', ' ')).map(_.mkString))
    val rows = sample(nasty, 300, seed = 7L).zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val out = tmpDir("csvprop")
    val df = rows.toDF("id", "v")
    Writers.write(df, DestinationConfig("CSV",
      ConnectionDetails(path = Some(s"$out/d"), includeHeader = Some(true))))
    val back = Readers.csv(spark, s"$out/d",
        List(FieldMapping("id", "id"), FieldMapping("v", "v")), header = true)
      .select(col("id").cast("long"), col("v"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse("")).toMap
    rows.foreach { case (id, v) =>
      assert(back(id) == v, s"row $id: wrote ${v.map(_.toInt)} got ${back(id).map(_.toInt)}")
    }
  }

  test("prefix-filtered join == quadratic all-pairs on generated corpora (losslessness property)") {
    // random short documents over a tiny vocabulary force heavy
    // shingle collisions, near-threshold Jaccard values, and docs
    // shorter than the shingle width — the boundary soup where a
    // wrong prefix length or a broken total order would lose pairs
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    val doc = Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    for (seed <- Seq(11L, 23L)) {
      val texts = sample(doc, 60, seed).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = texts.toDF("doc_id", "text")
      def pairs(d: org.apache.spark.sql.DataFrame) = d
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sh = graft.operators.Dedup.shingles(df, "doc_id", "text")
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val quad = sh.as("a").join(sh.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("c"))
        .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
        .filter(col("c") * 10 >= (col("na") + col("nb") - col("c")) * 7)
      val pf = graft.operators.Dedup.prefixFilterNearDups(df, "doc_id", "text")
      assert(pairs(pf) == pairs(quad),
        s"seed=$seed: missed=${pairs(quad) -- pairs(pf)} extra=${pairs(pf) -- pairs(quad)}")
    }
  }

  test("PqCodec kernels agree with straightforward reference implementations on random input") {
    // one generated corpus, one Spark round-trip: random vectors +
    // random codebooks through the native encode/ADC/batch-ADC/sig
    // kernels, checked cell-by-cell against plain-Scala re-derivations
    val dim = 8; val m = 4; val sub = dim / m; val k = 5; val nBits = 12
    val dGen = Gen.chooseNum(-10.0, 10.0)
    val cb: Array[Array[Array[Double]]] = Array.tabulate(m)(j =>
      sample(Gen.listOfN(sub, dGen), k, seed = 100L + j).map(_.toArray).toArray)
    val probe = sample(dGen, dim, seed = 42L).toArray
    val dtable: Array[Array[Double]] = Array.tabulate(m)(j =>
      cb(j).map(c => c.zipWithIndex.map { case (x, i) =>
        val d = probe(j * sub + i) - x; d * d }.sum))
    val vecs = sample(Gen.listOfN(dim, dGen), 200, seed = 9L)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val got = graft.operators.Similarity.pqEncode(
        vecs.toDF("id", "e").withColumn("e", col("e").cast("array<double>")), "e", cb)
      .withColumn("adc", graft.functions.PqCodec.adc(col("pq_code"), dtable))
      .withColumn("badc", graft.functions.PqCodec.adcBatch(
        col("pq_code"), typedLit(probe.toSeq), cb))
      .withColumn("sig", graft.operators.Similarity.signature(col("e"), dim, nBits))
      .select("id", "pq_code", "adc", "badc", "sig")
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Int](1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    vecs.foreach { case (id, v) =>
      val arr = v.toArray
      val wantCodes = (0 until m).map { j =>
        val s = java.util.Arrays.copyOfRange(arr, j * sub, (j + 1) * sub)
        cb(j).zipWithIndex.minBy { case (c, ci) => (d2(s, c), ci) }._2
      }
      val (codes, adc, badc, sig) = got(id)
      assert(codes == wantCodes, s"vec $id: codes $codes != $wantCodes")
      val wantAdc = codes.zipWithIndex.map { case (c, j) => dtable(j)(c) }.sum
      assert(math.abs(adc - wantAdc) < 1e-9, s"vec $id adc")
      val wantBadc = codes.zipWithIndex.map { case (c, j) =>
        d2(cb(j)(c), java.util.Arrays.copyOfRange(probe, j * sub, (j + 1) * sub)) }.sum
      assert(math.abs(badc - wantBadc) < 1e-9, s"vec $id batch adc")
      val wantSig = (0 until nBits).map { p =>
        val dot = (0 until dim).map(d => arr(d) * graft.functions.PqCodec.planeWeight(p, d)).sum
        if (dot >= 0.0) 1L << p else 0L
      }.reduce(_ | _)
      assert(sig == wantSig, s"vec $id signature")
    }
  }

  test("decimal cast round-trips through string for arbitrary scaled values") {
    val g = for {
      unscaled <- Gen.chooseNum(-999999999999999L, 999999999999999L)
      scale <- Gen.chooseNum(0, 6)
    } yield new java.math.BigDecimal(java.math.BigInteger.valueOf(unscaled), scale)
    val vals = sample(g, 200, seed = 11L).distinct
    val df = vals.map(_.toPlainString).toDF("s")
      .select(col("s"), CastEngine.castTo(col("s"), "DECIMAL(28,6)").as("d"))
    df.collect().foreach { r =>
      val expect = new java.math.BigDecimal(r.getString(0)).setScale(6)
      assert(r.getDecimal(1).compareTo(expect) == 0, s"${r.getString(0)} -> ${r.getDecimal(1)}")
    }
  }

  test("boolean lenient cast: anything outside the truthy/falsy sets is null") {
    val truthy = Set("true", "1", "y", "yes", "t")
    val falsy = Set("false", "0", "n", "no", "f")
    val g = Gen.oneOf(Gen.alphaNumStr.map(_.take(6)),
      Gen.oneOf(truthy.toSeq), Gen.oneOf(falsy.toSeq),
      Gen.oneOf(truthy.toSeq).map(_.toUpperCase), Gen.oneOf(" y ", " NO", "tRuE"))
    val vals = sample(g, 300, seed = 13L)
    val got = vals.toDF("s")
      .select(col("s"), CastEngine.castTo(col("s"), "BOOLEAN").as("b")).collect()
    got.foreach { r =>
      val norm = r.getString(0).trim.toLowerCase
      val expect: Any =
        if (truthy(norm)) true else if (falsy(norm)) false else null
      assert(r.get(1) == expect, s"'${r.getString(0)}' -> ${r.get(1)} (want $expect)")
    }
  }

  test("fingerprint is order-sensitive and collision-light on generated corpus") {
    val vals = sample(Gen.asciiPrintableStr.suchThat(_.nonEmpty), 500, seed = 17L).distinct
    val fps = vals.toDF("t")
      .select(graft.functions.Fingerprint.fingerprint(col("t"))).collect().map(_.getLong(0))
    // pigeonhole sanity: distinct inputs rarely collide in [0, 1e9+7)
    assert(fps.distinct.length >= vals.length - 2)
  }

  test("upsert keepLatest: one row per key, max version wins, idempotent re-apply") {
    val rows = sample(for {
      k <- Gen.chooseNum(0L, 40L)
      ver <- Gen.chooseNum(0L, 5L)
      v <- Gen.alphaStr
    } yield (k, ver, v), 300, seed = 23L)
    val (existing, updates) = rows.splitAt(200)
    val e = existing.toDF("k", "ver", "v")
    val u = updates.toDF("k", "ver", "v")
    val merged = graft.operators.Upsert.keepLatest(e, u, Seq("k"), "ver")
    val out = merged.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // exactly one surviving row per key
    assert(out.map(_._1).distinct.length == out.length)
    // survivor carries the max version present for that key
    val maxVer = rows.groupBy(_._1).map { case (k, rs) => k -> rs.map(_._2).max }
    out.foreach { case (k, ver) => assert(ver == maxVer(k), s"key $k kept version $ver != max ${maxVer(k)}") }
    // re-applying the same update batch changes nothing
    val again = graft.operators.Upsert.keepLatest(merged, u, Seq("k"), "ver")
    assert(again.except(merged).isEmpty && merged.except(again).isEmpty)
  }

  test("scrubPii leaves no email/phone/id-run patterns behind on generated text") {
    val piiGen = for {
      pre <- Gen.alphaStr
      user <- Gen.alphaNumStr.suchThat(_.nonEmpty)
      n <- Gen.chooseNum(100000L, 99999999999L)
      post <- Gen.alphaStr
    } yield s"$pre $user@mail-${n % 97}.example.com then 555-123-4567 and id $n $post"
    val texts = sample(Gen.oneOf(piiGen, Gen.asciiPrintableStr), 200, seed = 31L)
    val scrubbed = texts.toDF("t")
      .select(graft.operators.Privacy.scrubPii(col("t")).as("s"))
      .collect().map(_.getString(0))
    val email = graft.operators.Privacy.EmailPattern.r
    val phone = graft.operators.Privacy.PhonePattern.r
    val id = graft.operators.Privacy.IdPattern.r
    scrubbed.foreach { s =>
      assert(email.findFirstIn(s).isEmpty, s"email survived scrub: $s")
      assert(phone.findFirstIn(s).isEmpty, s"phone survived scrub: $s")
      assert(id.findFirstIn(s).isEmpty, s"id run survived scrub: $s")
    }
  }

  test("chunkDocuments covers every token position; stride windows reconstruct the doc") {
    val docGen = Gen.chooseNum(1, 150)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc", "dd")).map(_.mkString(" ")))
    val rows = sample(docGen, 100, seed = 43L).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val chunkSize = 16; val stride = 16 // non-overlapping => exact reconstruction
    val chunks = graft.operators.Sampling
      .chunkDocuments(rows.toDF("doc_id", "text"), "doc_id", "text", chunkSize, stride)
      .orderBy("doc_id", "chunk_idx")
      .collect().map(r => (r.getLong(0), r.getString(3)))
    val rebuilt = chunks.groupBy(_._1).view.mapValues(_.map(_._2).mkString(" ")).toMap
    rows.foreach { case (id, t) =>
      assert(rebuilt(id) == t, s"doc $id not reconstructed from its chunks")
    }
  }

  test("deterministicShuffle on generated ids: bijective positions, stable across reruns") {
    val ids = sample(Gen.chooseNum(0L, Long.MaxValue / 2), 500, seed = 47L).distinct
    val df = ids.toDF("id")
    val p1 = graft.operators.Sampling.deterministicShuffle(df, "id", buckets = 32)
      .select("id", "shuffle_pos").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p1.values.toSeq.sorted == (0L until ids.length).toSeq, "not a permutation")
    val p2 = graft.operators.Sampling.deterministicShuffle(df, "id", buckets = 32)
      .select("id", "shuffle_pos").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p1 == p2, "shuffle positions must be reproducible")
  }

  test("portable-regex core: generated grammar accepted, engine metric == plain Java find()") {
    // grammar generator for the documented Java∩RE2 portable core
    val litG: Gen[String] = Gen.oneOf(
      Gen.alphaNumChar.map(_.toString),
      Gen.oneOf("\\.", "\\+", "\\*", "\\$", "\\[", "\\]", "\\\\", "\\?"))
    val clsG: Gen[String] = for {
      neg <- Gen.oneOf("", "^")
      parts <- Gen.listOfN(3, Gen.oneOf("a-f", "0-9", "xy", "z", "\\d", "\\s"))
    } yield s"[$neg${parts.mkString}]"
    val shorthand = Gen.oneOf("\\d", "\\w", "\\s", "\\D", "\\W", "\\S", ".")
    def atomG(depth: Int): Gen[String] =
      if (depth <= 0) Gen.oneOf(litG, clsG, shorthand)
      else Gen.frequency(6 -> atomG(0),
        1 -> seqG(depth - 1).map(s => s"($s)"),
        1 -> seqG(depth - 1).map(s => s"(?:$s)"),
        1 -> (for { a <- seqG(depth - 1); b <- seqG(depth - 1) } yield s"(?:$a|$b)"))
    def quantG: Gen[String] = Gen.frequency(4 -> Gen.const(""),
      1 -> Gen.oneOf("*", "+", "?", "{2}", "{1,3}", "{2,}", "*?", "+?", "??"))
    def pieceG(depth: Int): Gen[String] = for { a <- atomG(depth); q <- quantG } yield a + q
    def seqG(depth: Int): Gen[String] =
      Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, pieceG(depth)).map(_.mkString))
    val patG: Gen[String] = for {
      pre <- Gen.oneOf("", "^"); body <- seqG(2); post <- Gen.oneOf("", "$")
    } yield pre + body + post

    val pats = sample(patG, 80, seed = 61L).distinct
      .filter(p => scala.util.Try(java.util.regex.Pattern.compile(p)).isSuccess)
    assert(pats.length >= 40, s"generator degenerated: ${pats.length} valid patterns")
    pats.foreach(p => assert(graft.operators.Quality.portablePattern(p),
      s"recognizer rejected a portable-core pattern: $p"))
    // constructs that exist or behave differently across engines
    Seq("(?=a)", "(?!a)b", "(?<=a)b", "(?>ab)", "a*+", "a{1,2}+", "(a)\\1",
        "(?i)abc", "[a&&[b]]", "[[:alpha:]]", "[a[b]c]", "\\babc", "\\p{L}x").foreach(p =>
      assert(!graft.operators.Quality.portablePattern(p),
        s"recognizer accepted a non-portable pattern: $p"))
    // engine semantics pin: the metric Quality.check computes via rlike
    // equals the plain-Java unanchored find() fraction — ONE Spark pass
    // for all rules (check() compiles them into a single agg)
    val corpus = sample(Gen.oneOf(Gen.alphaNumStr.map(_.take(12)),
      Gen.oneOf("abc 123", "  x  ", "A1b2", "zz-top", "", "0.5", "[lit]", "a+b")),
      200, seed = 67L)
    val rules = pats.take(12).map(p => graft.operators.Quality.MatchesRegex("t", p, 0.5))
    // check() emits one verdict row per rule in declaration order
    val metrics = graft.operators.Quality.check(corpus.toDF("t"), rules)
      .collect().map(_.getDouble(2))
    metrics.zip(rules).foreach { case (m, r) =>
      val re = java.util.regex.Pattern.compile(r.pattern)
      val want = corpus.count(s => re.matcher(s).find()).toDouble / corpus.length
      assert(math.abs(m - want) < 1e-12, s"pattern ${r.pattern}: engine $m vs java $want")
    }
  }

  test("stratifiedSample membership is a pure function of id (partition-layout independent)") {
    val rows = sample(Gen.chooseNum(0L, 1000000L), 400, seed = 53L).distinct
      .map(id => (id, if (id % 3 == 0) "en" else "de"))
    val df = rows.toDF("id", "lang")
    val a = graft.operators.Sampling
      .stratifiedSample(df, "id", "lang", Map("en" -> 30), 70)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = graft.operators.Sampling
      .stratifiedSample(df.repartition(13), "id", "lang", Map("en" -> 30), 70)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b, "membership must not depend on partitioning")
  }

  test("editDistance1Pairs == quadratic levenshtein join on generated short strings") {
    // tiny alphabet + short lengths force dense dist-1 families,
    // equal strings, and length-1/length-2 edge cases where a wrong
    // deletion index or a lost identity variant drops pairs
    val str = Gen.choose(1, 5).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    for (seed <- Seq(7L, 31L)) {
      val names = sample(str, 50, seed).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = names.toDF("id", "nm")
      val got = graft.operators.Dedup.editDistance1Pairs(df, "id", "nm")
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val quad = (for {
        (ia, a) <- names; (ib, b) <- names if ia < ib
        if levRef(a, b) <= 1
      } yield (ia, ib)).toSet
      assert(got == quad, s"seed=$seed missed=${quad -- got} extra=${got -- quad}")
    }
  }

  test("editDistancePairs(maxDist=2) == quadratic levenshtein join on generated short strings") {
    // same adversarial generator as k=1 plus the k=2 traps: pure
    // 2-char insertions (len 1 vs 3), double substitutions, and the
    // 0/1-char strings where an unguarded sequence() would descend
    val str = Gen.choose(1, 5).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    for (seed <- Seq(7L, 31L)) {
      val names = sample(str, 50, seed).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = names.toDF("id", "nm")
      val got = graft.operators.Dedup.editDistancePairs(df, "id", "nm", maxDist = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val quad = (for {
        (ia, a) <- names; (ib, b) <- names if ia < ib
        d = levRef(a, b) if d <= 2
      } yield (ia, ib, d.toLong)).toSet
      assert(got == quad, s"seed=$seed missed=${quad -- got} extra=${got -- quad}")
    }
  }

  private def levRef(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("groupedCumWeights == window reference on generated weighted groups with nulls") {
    import org.apache.spark.sql.expressions.Window
    val row = for {
      g <- Gen.oneOf(Some("x"), Some("y"), None)
      v <- Gen.oneOf(Gen.const(None), Gen.choose(-5L, 5L).map(Some(_)))
      w <- Gen.choose(1L, 4L)
    } yield (g, v, w)
    for (seed <- Seq(3L, 19L)) {
      val df = sample(row, 80, seed).toDF("g", "v", "w")
      val ref = df.groupBy("g", "v").agg(sum("w").as("wv"))
        .withColumn("cum_w", sum("wv").over(
          Window.partitionBy("g").orderBy("v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("tot_w", sum("wv").over(Window.partitionBy("g")))
        .select("g", "v", "cum_w", "tot_w")
        .orderBy("g", "v").collect().toSeq
      for (bw <- Seq(1.0, 3.0, 100.0)) {
        val got = graft.operators.Ranking.groupedCumWeights(
            df, Seq("g"), "v", col("w"), bandWidth = bw)
          .orderBy("g", "v").collect().toSeq
        assert(got == ref, s"seed=$seed bandWidth=$bw")
      }
    }
  }

  test("streaming gap detection == dense-spine truth on a generated feed (cross-batch gaps)") {
    // random sparse activity per stream over a 60-hour span, replayed
    // time-split in two micro-batches — the emitted silent hours must
    // equal each stream's (min, max) spine minus its observed set,
    // INCLUDING gaps that straddle the batch boundary (the state's job)
    val hourGen = Gen.chooseNum(0, 59)
    val hoursByType: Map[String, Set[Int]] = Seq("alpha", "beta").map { t =>
      t -> (sample(hourGen, 14, seed = t.hashCode.toLong).toSet + 0 + 59)
    }.toMap
    val rows = hoursByType.toSeq.flatMap { case (t, hs) =>
      hs.toSeq.map(h => (t, new java.sql.Timestamp(h * 3600000L)))
    }
    val work = tmpDir("gapprop")
    val src = s"$work/src"
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(src))
    def stage(name: String, part: Seq[(String, java.sql.Timestamp)], ageMs: Long): Unit = {
      val tmp = s"$work/$name"
      part.toDF("event_type", "ts").coalesce(1).write.parquet(tmp)
      val f = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      val staged = java.nio.file.Paths.get(src, s"$name.parquet")
      java.nio.file.Files.move(f.toPath, staged)
      java.nio.file.Files.setLastModifiedTime(staged,
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - ageMs))
    }
    val cut = new java.sql.Timestamp(30L * 3600000L)
    stage("h0", rows.filter(_._2.before(cut)), 10000L)
    stage("h1", rows.filterNot(_._2.before(cut)), 0L)
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.TimestampType))))
      .option("maxFilesPerTrigger", 1).parquet(src)
    val got = {
      val ds = graft.streaming.EventStreams.gapFillStream(stream)(spark)
      val out = s"$work/out"
      val q = ds.toDF().writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", s"$work/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(out).collect()
        .map(r => (r.getString(0), r.getLong(1) / 3600000000L)).toSet
    }
    val truth = hoursByType.toSeq.flatMap { case (t, hs) =>
      ((hs.min + 1) until hs.max).filterNot(hs.contains).map(h => (t, h.toLong))
    }.toSet
    assert(got == truth,
      s"missing=${(truth -- got).take(5)} extra=${(got -- truth).take(5)}")
  }
}
