package graft

import graft.model.{ConnectionDetails, FieldMapping, SourceConfig}
import graft.sources.Readers
import org.apache.spark.sql.functions._

/** Plan-shape assertions: the scale claims (pushdown, pruning,
  * broadcast, top-k) hold in the EXECUTED plan, not just by intent. */
class PlanSpec extends SparkTestBase {

  private def planString(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // materialize so AQE finalizes
    // formatted mode: the simple toString truncates scan metadata
    // (PushedFilters lists get cut at ~100 chars)
    df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
  }

  test("mapping filter + projection reach the parquet scan (S4/F1/P1)") {
    val q = Queries.queries("load_sales")(spark, sf)
    val plan = planString(q)
    assert(plan.contains("PushedFilters:"), "no pushed filters in scan")
    assert(plan.contains("EqualTo(o_orderstatus,F)"), s"status filter not pushed:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(o_totalprice,1000.0)"), "price filter not pushed")
    // column pruning: unmapped column o_orderpriority must not be read
    assert(!plan.contains("o_orderpriority"), "unpruned column read from parquet")
  }

  test("JDBC round-trip pushes its predicate into the database scan (S1/S3/S4)") {
    // runs the real Derby write+read: the filter must reach the JDBC
    // relation (WHERE executes in the DBMS, not post-scan in Spark),
    // and the scan must carry the 4 stride partitions
    val q = Queries.queries("etl_jdbc_roundtrip")(spark, sf)
    val plan = planString(q)
    assert(plan.contains("PushedFilters:"), s"no pushed filters in JDBC scan:\n$plan")
    assert(plan.contains("GreaterThan(total,100000.0)"), s"price filter not pushed:\n$plan")
    assert(plan.contains("EqualTo(status,F)"), s"status filter not pushed:\n$plan")
    assert(plan.contains("numPartitions=4"), s"stride partitioning missing:\n$plan")
  }

  test("approx-agreement plans without a buffering Percentile; counting median prunes its scan") {
    // regression pin for the round-8 fix: built-in percentile() holds
    // every group value in ONE aggregation buffer (executor OOM at
    // scale), and mixing countDistinct with sketch aggregates makes
    // the distinct rewrite build a sketch buffer per distinct key —
    // neither shape may reappear in this plan
    val plan = planString(Queries.queries("agg_approx_agreement")(spark, sf))
    assert("(?<!approx_)percentile\\(".r.findFirstIn(plan).isEmpty,
      s"buffering exact percentile must not return to this plan:\n${plan.take(800)}")
    assert(plan.contains("approx_percentile") || plan.contains("ApproximatePercentile"),
      "the sketch side should still be present")
    // the counting-median subtree reads only (l_returnflag, l_quantity)
    val median = graft.operators.Ranking.groupedCountingQuantile(
      Tables.t(spark, sf, "lineitem"), "l_returnflag", "l_quantity", 0.5)
    val mPlan = planString(median)
    assert(!mPlan.contains("l_extendedprice") && !mPlan.contains("l_partkey"),
      s"counting median must prune to its two columns:\n${mPlan.take(800)}")
    assert(mPlan.contains("partial_count") || mPlan.contains("partial_sum") ||
      mPlan.contains("HashAggregate"),
      "counting pass should be a hash aggregate with map-side partials")
  }

  test("dimension joins broadcast; top-k uses TakeOrdered (no global sort)") {
    val q3 = Queries.queries("q3_topk_revenue")(spark, sf)
    val plan = planString(q3)
    assert(plan.contains("BroadcastHashJoin"), "expected broadcast join for dims")
    assert(plan.contains("TakeOrderedAndProject"), "expected TakeOrdered for LIMIT k")
    assert(!plan.contains("SortMergeJoin"), s"unexpected SMJ at this scale:\n$plan")
  }

  test("aggregation is partial before its single exchange (map-side combine)") {
    val q1 = Queries.queries("q1_agg")(spark, sf)
    val plan = planString(q1)
    assert(plan.contains("partial_sum"), "no map-side partial aggregation")
  }

  test("decontamination probes a broadcast gram set (training side never sort-merge joins)") {
    val plan = planString(Queries.queries("decontaminate")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), "eval gram set must broadcast")
    assert(!plan.contains("SortMergeJoin"), s"training side must not SMJ:\n$plan")
  }

  test("bloom decontamination prunes map-side (probe in a Filter, no SMJ)") {
    val plan = planString(Queries.queries("decontaminate_bloom")(spark, sf))
    assert(plan.toLowerCase.contains("bloomgramhits"),
      s"bloom probe expression must appear in the plan:\n${plan.take(800)}")
    assert(!plan.contains("SortMergeJoin"), s"candidates must broadcast-join:\n$plan")
  }

  test("keyword search filters postings BEFORE the shuffle (candidates only)") {
    val plan = planString(Queries.queries("text_keyword_search")(spark, sf))
    // the query-token predicate must be a Filter on the exploded
    // postings feeding a PARTIAL aggregate — candidates are pruned
    // and combined map-side, so only hits cross the one exchange
    assert(plan.contains("spark") && plan.contains("Filter"),
      s"query-token filter missing from the plan:\n${plan.take(1200)}")
    assert(plan.contains("partial_count"),
      s"conjunction count must partial-aggregate before its exchange:\n${plan.take(1200)}")
    assert(!plan.contains("SortMergeJoin"),
      s"negative term + doc metadata must broadcast-join, never SMJ:\n$plan")
  }

  test("indexed keyword search prunes token buckets (reads k of 64)") {
    val plan = planString(Queries.queries("text_keyword_search_indexed")(spark, sf))
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
    assert(m.isDefined, s"bucket pruning missing from the plan:\n${plan.take(1500)}")
    val (sel, tot) = (m.get.group(1).toInt, m.get.group(2).toInt)
    assert(sel < tot, s"no buckets pruned: $sel of $tot")
  }

  test("BM25 scoring prunes token buckets and takes top-10 without a global sort") {
    val plan = planString(Queries.queries("text_bm25_topk")(spark, sf))
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
    assert(m.isDefined, s"bucket pruning missing from the BM25 plan:\n${plan.take(1500)}")
    val (sel, tot) = (m.get.group(1).toInt, m.get.group(2).toInt)
    assert(sel < tot, s"no buckets pruned: $sel of $tot")
    assert(plan.contains("TakeOrderedAndProject"),
      "expected TakeOrdered for the top-10 cut")
    assert(!plan.contains("SortMergeJoin"),
      s"the idf join must broadcast (terms-sized), not SMJ:\n${plan.take(1500)}")
  }

  test("batch IVF-PQ serving: probed-cell equi-join hashes on broadcast, never SMJ/cartesian") {
    // the serving-shape claim in plan terms: per-(probe, cell)
    // residual tables arrive by the broadcast cell JOIN (metadata
    // side), so the corpus-side codes join by hash — a SortMergeJoin
    // would shuffle the whole encoded corpus per query batch, and a
    // cartesian would mean the cell key was lost
    val plan = planString(Queries.queries("sim_ivfpq_batch_topk")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"probed-cell join must broadcast-hash:\n${plan.take(1500)}")
    assert(!plan.contains("SortMergeJoin"),
      s"no corpus shuffle join in the serving path:\n${plan.take(1500)}")
    assert(!plan.contains("CartesianProduct"),
      s"cell key lost — cartesian in the serving path:\n${plan.take(1500)}")
  }

  test("bucketed multi-probe LSH: signature equi-join, not a corpus-wide nested loop") {
    // the indexed-LSH claim: candidates come from the sig hash join
    // (the Hamming-ball keys broadcast), where the scan form's
    // crossJoin is a BroadcastNestedLoopJoin over every corpus row
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .withColumn("e", col("embedding").cast(ArrayType(DoubleType)))
    val probes = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("e").as("probe_e"))
    val plan = planString(graft.operators.Similarity.annBucketedBatchTopK(
      emb, probes, "e", dim = 64, k = 5, nBits = 16, probeHamming = 2))
    assert(plan.contains("BroadcastHashJoin"),
      s"signature equi-join must broadcast-hash:\n${plan.take(1500)}")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"bucketed form must not scan-join the corpus:\n${plan.take(1500)}")
  }

  test("incremental BM25 keeps bucket pruning across the corpus+batch append") {
    // the maintainability claim in plan terms: after the batch
    // bucket-appends, a 3-term query still reads only its terms'
    // buckets of the ENLARGED table, and the query-time norm does
    // not reintroduce a corpus-sized join (stats is one broadcast row)
    val plan = planString(Queries.queries("text_bm25_incremental")(spark, sf))
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
    assert(m.isDefined, s"bucket pruning missing from the incremental BM25 plan:\n${plan.take(1500)}")
    val (sel, tot) = (m.get.group(1).toInt, m.get.group(2).toInt)
    assert(sel < tot, s"no buckets pruned: $sel of $tot")
    assert(plan.contains("TakeOrderedAndProject"),
      "expected TakeOrdered for the top-10 cut")
    assert(!plan.contains("SortMergeJoin"),
      s"idf+stats must broadcast (terms-sized/one-row), not SMJ:\n${plan.take(1500)}")
  }

  test("BM25 ingest serving partition-prunes to the query terms' buckets") {
    // the path-layout twin of the bucketBy pin above: the ingest
    // state's postings scan must carry a `bucket` PARTITION filter
    // (k of 64 bucket dirs read per batch partition), stats must
    // fold broadcast-side (no SMJ anywhere in the query)
    import spark.implicits._
    val work = tmpDir("graft_plan_bm25ing_")
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    graft.streaming.EventStreams.ingestBm25Batch(spark,
      docs.filter(col("doc_id") % 2 === 0), s"$work/state", 0L)
    graft.streaming.EventStreams.ingestBm25Batch(spark,
      docs.filter(col("doc_id") % 2 === 1), s"$work/state", 1L)
    val plan = planString(graft.TextQueries.bm25IngestTopK(spark,
      s"$work/state", Seq("spark", "merge", "window"), 10))
    val pf = "PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan)
    assert(pf.isDefined,
      s"postings scan must partition-filter on bucket:\n${plan.take(2000)}")
    assert(plan.contains("TakeOrderedAndProject"), "expected TakeOrdered top-10")
    assert(!plan.contains("SortMergeJoin"),
      s"idf/stats joins must broadcast:\n${plan.take(1500)}")
  }

  test("ANN ingest serving partition-prunes postings to the current era") {
    import spark.implicits._
    val work = tmpDir("graft_plan_anning_")
    val vecs = (0 until 40).map(i =>
      (i.toLong, Seq(1.0 * (i % 3), 1.0, 0.1 * i))).toDF("vec_id", "e")
    graft.streaming.EventStreams.ingestAnnBatch(spark,
      vecs.filter(col("vec_id") < 20), s"$work/index", 0L,
      vecCol = "e", nLists = 4, mode = "rebuild")
    graft.streaming.EventStreams.ingestAnnBatch(spark,
      vecs.filter(col("vec_id") >= 20), s"$work/index", 1L,
      vecCol = "e", nLists = 4, mode = "rebuild") // new era: 1
    val probes = vecs.filter(col("vec_id") === 3)
      .select(col("vec_id").as("probe_id"), col("e").as("probe_e"))
    val plan = planString(graft.streaming.EventStreams.annIngestTopK(
      spark, s"$work/index", probes, k = 3, nProbe = 4))
    val pf = "PartitionFilters: \\[[^\\]]*batch[^\\]]*>= 1".r.findFirstIn(plan)
    assert(pf.isDefined,
      s"postings scan must prune to batch >= era (1):\n${plan.take(2000)}")
  }

  test("segmented rank shuffles on (p, bucket), not p alone") {
    val plan = planString(Queries.queries("window_rank_scalable")(spark, sf))
    assert(plan.contains("_bkt"),
      s"exchange/window must carry the bucket key:\n${plan.take(800)}")
  }

  test("top-k aggregate plans partial+final ObjectHashAggregate") {
    val plan = planString(Queries.queries("topk_per_group_agg")(spark, sf))
    val hits = "ObjectHashAggregate".r.findAllIn(plan).size
    assert(hits >= 2, s"expected partial and final ObjectHashAggregate, got $hits:\n${plan.take(800)}")
  }

  test("stratified sampling and chunking are shuffle-free maps") {
    import graft.operators.Sampling
    val docs = Tables.t(spark, sf, "documents").select("doc_id", "lang", "text")
    val sampled = Sampling.stratifiedSample(docs, "doc_id", "lang", Map("en" -> 40), 100)
    val sPlan = planString(sampled)
    assert(!sPlan.contains("Exchange"), s"stratified sample must not shuffle:\n$sPlan")
    val chunked = Sampling.chunkDocuments(docs, "doc_id", "text", 32, 24)
    val cPlan = planString(chunked)
    assert(!cPlan.contains("Exchange"), s"chunking must not shuffle:\n$cPlan")
    assert(cPlan.contains("Generate"), "chunking should be a per-row generate")
  }

  test("deterministic shuffle broadcasts its offset table (no data-wide sort)") {
    import graft.operators.Sampling
    val docs = Tables.t(spark, sf, "documents").select("doc_id")
    val plan = planString(Sampling.deterministicShuffle(docs, "doc_id", buckets = 16))
    assert(plan.contains("BroadcastHashJoin"), "offsets must broadcast-join back")
    assert(!plan.contains("SortMergeJoin"), s"no SMJ expected:\n$plan")
  }

  test("weighted mixing is a shuffle-free replicate-in-place") {
    import graft.operators.Sampling
    val docs = Tables.t(spark, sf, "documents").select("doc_id", "source")
    val plan = planString(Sampling.weightedMix(docs, "doc_id",
      when(col("source") === "src0", 2500L).otherwise(400L)))
    assert(!plan.contains("Exchange"), s"weightedMix must not shuffle:\n$plan")
    assert(plan.contains("Generate"), "replication should be a per-row generate")
  }

  test("heavy hitters recount joins a broadcast candidate set (no vocabulary SMJ)") {
    import graft.operators.HeavyHitters
    val toks = Tables.t(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
    val plan = planString(HeavyHitters.exactHeavyHitters(toks, col("token"), t = 50))
    assert(plan.contains("ObjectHashAggregate"), "sketch must plan via ObjectHashAggregate")
    assert(plan.contains("BroadcastHashJoin"), "candidates must broadcast back")
    assert(!plan.contains("SortMergeJoin"), s"no full-vocabulary SMJ expected:\n$plan")
  }

  test("runtime bloom-filter join injection fires: the optimizer's own bloom pruning") {
    // the runtime complement of the manifest tier's bloom skipping:
    // a selective filter on the small join side must inject a
    // might_contain(bloom_filter_agg(...)) guard into the BIG side's
    // scan path, so non-joining rows die before the shuffle — at
    // 100 TB this is the difference between shuffling the fact table
    // and shuffling the matching slice. Thresholds are tuned because
    // the defaults (10 GB application side) never fire at test scale;
    // what is pinned is that the rule CAN fire on this engine build
    // and our plans don't structurally prevent it.
    val work = tmpDir("graft_rtbloom_")
    spark.range(0, 200000).selectExpr("id AS k", "id % 100 AS f")
      .write.parquet(s"$work/big")
    spark.range(0, 5000).selectExpr("id AS k", "id % 10 AS g")
      .write.parquet(s"$work/dim")
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val big = spark.read.parquet(s"$work/big")
      val dim = spark.read.parquet(s"$work/dim").filter(col("g") === 3)
      val joined = big.join(dim, "k")
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"runtime bloom filter not injected:\n$optimized")
      // and the guarded plan still returns the exact join result
      assert(joined.count() == 500)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("range-dimension tier lookup broadcasts the boundary table (nested-loop on the hint)") {
    // a non-equi band join has no hash key; the only scale-correct
    // plan with a metadata-sized dimension is broadcast nested-loop —
    // the fact side must NOT shuffle or sort
    val plan = planString(Queries.queries("etl_tier_lookup")(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"tier lookup must broadcast the boundary table:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"fact side must stream in place:\n$plan")
  }

  test("binned interval join plans as an equi hash join, never nested-loop") {
    val plan = planString(Queries.queries("events_interval_join")(spark, sf))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must bin into an equi join:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"expected a keyed join on (user, bin):\n$plan")
  }

  test("column profiler is one scan wide: a single aggregate subtree, no join") {
    import graft.operators.Profile
    val plan = planString(Profile.profile(
      Tables.t(spark, sf, "customer"),
      Seq("c_custkey", "c_name", "c_acctbal")))
    assert(!plan.contains("Join"), s"profiler must not self-join per column:\n$plan")
    // exact mode uses multi-distinct Expand — visible and documented
    assert(plan.contains("Expand"), "exact distinct counts plan via Expand")
    val approx = planString(Profile.profile(
      Tables.t(spark, sf, "customer"),
      Seq("c_custkey", "c_name", "c_acctbal"), exact = false))
    assert(!approx.contains("Expand"),
      s"HLL mode must not Expand (constant sketch state per column):\n$approx")
  }

  test("compaction plans shuffle-free; range clustering has exactly one range exchange") {
    import graft.operators.Maintenance
    val df = Tables.t(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    val plain = planString(Maintenance.compactionPlan(df, 1, Nil))
    assert(!plain.contains("Exchange"), s"pure compaction must not shuffle:\n$plain")
    assert(plain.contains("Coalesce"), s"expected a coalesce merge:\n$plain")
    // splitting into MORE files than the scan produced cannot be done
    // by coalesce — that case must plan the round-robin shuffle
    val split = planString(Maintenance.compactionPlan(df, 64, Nil))
    assert(split.contains("RoundRobinPartitioning"),
      s"file splitting must plan a round-robin repartition:\n$split")
    val clustered = planString(Maintenance.compactionPlan(df, 2, Seq("o_orderkey")))
    assert(clustered.contains("rangepartitioning"),
      s"clustering must shuffle by range:\n$clustered")
    assert(!clustered.contains("hashpartitioning"),
      s"no hash shuffle expected in clustering:\n$clustered")
    // one exchange in the executed tree (AQE prints it once per stage
    // listing; the detail sections carry one numbered Exchange node
    // per distinct operator — final + initial plan share it)
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(clustered).size
    assert(exchanges <= 2, s"more than one distinct exchange:\n$clustered")
  }

  test("hive-partitioned scan prunes to one partition at planning time") {
    val q = Queries.queries("etl_partition_pruning")(spark, sf)
    q.collect()
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
    val helper = new AdaptiveSparkPlanHelper {}
    val scans = helper.collectWithSubqueries(q.queryExecution.executedPlan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, s"no file scan found:\n${q.queryExecution.executedPlan}")
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty,
      s"priority predicate must be a PARTITION filter, not a data filter:\n$scan")
    assert(scan.selectedPartitions.partitionCount == 1,
      s"expected exactly one pruned partition, got ${scan.selectedPartitions.partitionCount}")
  }

  test("join against the partitioned fact plans dynamic partition pruning") {
    // the runtime analog of static pruning: the partition filter is
    // only known after the dim side is filtered, and the scan must
    // still receive it (as a DynamicPruning subquery/broadcast reuse)
    // instead of reading all partitions
    val fact = spark.read.parquet(EtlQueries.partitionedOrdersFixture(spark, sf))
    import spark.implicits._
    // the dim must be a REAL scan with a filter above it: a filtered
    // local Seq constant-folds into a bare LocalRelation and the
    // pruning rule no longer sees a selective predicate to derive the
    // runtime filter from
    val dimDir = tmpDir("graft_dpp_dim_")
    Seq(("1-URGENT", 1), ("2-HIGH", 2), ("3-MEDIUM", 3))
      .toDF("prio", "grp").write.parquet(s"$dimDir/d")
    val dim = spark.read.parquet(s"$dimDir/d").filter(col("grp") === 1)
    val q = fact.join(dim, fact("o_orderpriority") === dim("prio"))
      .groupBy("o_orderstatus").count()
    q.collect()
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
    val helper = new AdaptiveSparkPlanHelper {}
    val scans = helper.collectWithSubqueries(q.queryExecution.executedPlan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.exists(_.partitionFilters.exists(
        _.toString.toLowerCase.contains("dynamicpruning"))),
      s"expected a dynamic pruning partition filter:\n${q.queryExecution.executedPlan}")
  }

  test("bucketed co-located join carries no join-side exchange") {
    // the gate row's 100 TB claim: both bucketed sides arrive
    // pre-partitioned on the join key, so even when neither side can
    // broadcast (forced here — at 100 TB neither side fits) the
    // sort-merge join runs directly on the bucket layout with ZERO
    // exchange beneath it
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = Queries.queries("join_bucketed_colocated")(spark, sf)
      q.collect()
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
      val helper = new AdaptiveSparkPlanHelper {}
      val joins = helper.collectWithSubqueries(q.queryExecution.executedPlan) {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(joins.nonEmpty,
        s"expected a sort-merge join with broadcast disabled:\n${q.queryExecution.executedPlan}")
      val below = joins.flatMap(j => helper.collectWithSubqueries(j) {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      })
      assert(below.isEmpty,
        s"bucketed sides must not shuffle into the join, got ${below.size}:\n${q.queryExecution.executedPlan}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("ref-integrity audit: data-scaled parents are NOT hint-broadcast (nation edges are)") {
    // the r13 verdict's fact-sized-broadcast fix: a forced
    // broadcast(orders.distinct) is ~150M keys through the driver at
    // sf100. With every broadcast threshold disabled, a user HINT is
    // the only thing that could still broadcast — so the data-scaled
    // edges (lineitem->orders, orders->customer) must plan as
    // shuffled anti joins here, while the enum-sized nation edges
    // legitimately keep their hint (and stay broadcast).
    val prevStatic = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val q = Queries.queries("diag_ref_integrity")(spark, sf)
      q.collect()
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
      val helper = new AdaptiveSparkPlanHelper {}
      val plan = q.queryExecution.executedPlan
      val shuffledAnti = helper.collectWithSubqueries(plan) {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
          if j.joinType.sql == "LEFT ANTI" => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
          if j.joinType.sql == "LEFT ANTI" => j
      }
      val broadcastAnti = helper.collectWithSubqueries(plan) {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
          if j.joinType.sql == "LEFT ANTI" => j
      }
      assert(shuffledAnti.size == 2,
        s"lineitem->orders and orders->customer must shuffle (no hint), got ${shuffledAnti.size}:\n$plan")
      assert(broadcastAnti.size == 2,
        s"the two nation edges keep their broadcast hint, got ${broadcastAnti.size}:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevStatic)
      prevAqe match {
        case Some(v) => spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }

  test("quality classifier applies map-side: weight table broadcasts, no SMJ on the scoring path") {
    // the 100 TB claim of learned-score application: the corpus-sized
    // feature stream must join the 1024-row weight table as a
    // BROADCAST (a sort-merge join there would shuffle the whole
    // exploded corpus by bucket id for nothing)
    val q = Queries.queries("text_quality_classifier")(spark, sf)
    val plan = planString(q)
    assert(plan.contains("BroadcastHashJoin"),
      s"weight table must broadcast-join the feature stream:\n${plan.take(1200)}")
    assert(!plan.contains("SortMergeJoin"),
      s"no sort-merge join belongs on the scoring path:\n${plan.take(1200)}")
  }

  test("BPE apply: the encode is map-side over the vocab (one keyed exchange, no join)") {
    // vocab-collapsed encode: the only shuffle is the word-count
    // groupBy; the 10-replace encode chain is a projection (no join,
    // no window anywhere in the plan)
    val q = Queries.queries("text_bpe_apply")(spark, sf)
    val plan = planString(q)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"the encode must not join:\n${plan.take(1200)}")
    assert(!plan.contains("WindowExec") && !plan.toLowerCase.contains("window group limit"),
      s"the encode must not window:\n${plan.take(1200)}")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-500 must be TakeOrdered, not a global sort:\n${plan.take(1200)}")
  }

  test("REST source with pluggable transport parses JSON-lines payloads") {
    val fake: String => String = url => {
      assert(url == "https://example.invalid/feed")
      """{"id": 1, "name": "a"}
        |{"id": 2, "name": "b"}""".stripMargin
    }
    val df = Readers.rest(spark,
      SourceConfig("REST_API", ConnectionDetails(path = Some("https://example.invalid/feed"))),
      fake)
    assert(df.orderBy("id").collect().map(_.getAs[String]("name")).toSeq == Seq("a", "b"))
  }

  test("mapped REST source flows through the standard mapping path") {
    val orig = Readers.restTransport
    Readers.restTransport = _ => """{"user": "x", "amount": "12.5"}"""
    try {
      val cfg = SourceConfig("REST", ConnectionDetails(path = Some("u")))
      val mappings = List(
        FieldMapping("user", "User"),
        FieldMapping("amount", "Amount", destFieldType = "DECIMAL(10,2)"))
      val out = graft.operators.MappingOp(
        Readers.forConfig(spark, cfg, mappings), mappings).collect()
      assert(out(0).getString(0) == "x")
      assert(out(0).getDecimal(1) == new java.math.BigDecimal("12.50"))
    } finally Readers.restTransport = orig
  }

  test("triangle closure joins the broadcast adjacency (the wedge set never shuffles)") {
    val plan = planString(Queries.queries("orders_triangle_count")(spark, sf))
    // the fixture's edge count is far below Graphs.triangleCount's
    // broadcast gate, so the plan must take the edge-intersection
    // branch: both adjacency joins broadcast-built — a shuffled join
    // here would mean the Sum(out-deg^2) wedge relation materializes
    // through an exchange. (Above the gate the wedge self-join
    // branch is the intended shape; GraphsSpec pins its equality on
    // a forced-zero threshold.)
    assert(plan.contains("BroadcastHashJoin"), "adjacency joins must broadcast")
    assert(!plan.contains("SortMergeJoin"), s"wedge-side SMJ crept in:\n$plan")
  }

  test("grouped cumulative weights: keyed fact aggregate runs once (checkpointed counts)") {
    val fact = Tables.t(spark, sf, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"))
    // the one fact-sized exchange is the (group, value)-keyed counts
    // aggregate — pin it on the counts plan itself...
    val counts = fact.groupBy("l_returnflag", "l_extendedprice")
      .agg(sum(lit(1L)).as("_w"))
    val keyed = """hashpartitioning\(l_returnflag#\d+, l_extendedprice#\d+""".r
    assert(keyed.findFirstIn(planString(counts)).isDefined,
      "counts aggregate must shuffle on (group, value)")
    // ...and pin that groupedCumWeights' own plan reads the
    // CHECKPOINTED value-level table instead of re-scanning the fact
    // per consumer (pre-checkpoint, the executed plan held 6 file
    // scans across the three counts lineages)
    val cw = graft.operators.Ranking.groupedCumWeights(
      fact, Seq("l_returnflag"), "l_extendedprice", lit(1L), bandWidth = 1000.0)
    val plan = planString(cw)
    assert(!plan.contains("FileScan parquet"),
      s"cumulative plan re-scans the fact table:\n${plan.take(2000)}")
    assert(plan.contains("ExistingRDD"), "expected the checkpointed counts scan")
  }

  test("key-skew top-10 plans TakeOrdered (per-partition heaps, no window at all)") {
    val q = Queries.queries("diag_key_skew")(spark, sf)
    val plan = planString(q)
    assert(plan.contains("TakeOrderedAndProject"),
      "expected TakeOrdered for the top-10 cut")
    assert(!plan.contains("Window"),
      s"a window crept back into the skew diagnostic:\n${plan.take(2000)}")
  }

  test("staged batch retrieval ranks stage 1 via the bounded heap, never a corpus window (r18 #1)") {
    // single-stage forms (brute batch / hard negatives / triplets —
    // and pqBatchTopK's no-rerank form): NO window anywhere; the rank
    // is the TopKPairs heap through ObjectHashAggregate, so the rank
    // shuffle carries probes·k rows, never probes·corpus
    for (q <- Seq("sim_batch_topk", "sim_hard_negatives", "sim_triplet_mining",
                  "sim_pq_batch_exact", "sim_ann_batch_topk",
                  "sim_hamming_batch_topk")) {
      val plan = planString(Queries.queries(q)(spark, sf))
      assert(!plan.contains("Window"),
        s"$q must rank via the bounded heap, found a window:\n${plan.take(2000)}")
      assert(plan.contains("ObjectHashAggregate"),
        s"$q should plan the heap shortlist via ObjectHashAggregate:\n${plan.take(1000)}")
    }
    // staged forms: stage 1 is the heap; the ONE window left is the
    // exact stage-2 re-rank, whose input is the probes×shortlist
    // fetch join — bounded by construction, never the corpus (the
    // IVF/IVF-PQ gates additionally carry probedCells' metadata-sized
    // cell rank, nLists×probes rows)
    for (q <- Seq("sim_mrl_topk", "sim_sq8_topk")) {
      val plan = planString(Queries.queries(q)(spark, sf))
      val windows = "Window \\[".r.findAllIn(plan).size
      assert(windows <= 1,
        s"$q should carry only the bounded stage-2 re-rank window, found $windows:\n${plan.take(2000)}")
      assert(plan.contains("ObjectHashAggregate"),
        s"$q stage 1 should plan the heap shortlist via ObjectHashAggregate:\n${plan.take(1000)}")
    }
  }

  test("the bounded-aggregate reports carry no unpartitioned window at all") {
    // survival cumulative, daily MA7 band, top-paths cut — all were
    // single-partition windows once; pinned window-free (triangular /
    // band broadcast joins + TakeOrdered) so the bench log's
    // WindowExec warning count stays zero
    for (q <- Seq("events_conversion_survival", "orders_daily_ma7", "events_top_paths")) {
      val plan = planString(Queries.queries(q)(spark, sf))
      assert(!plan.contains("], [], ["),
        s"unpartitioned window crept back into $q:\n${plan.take(2000)}")
    }
  }

  test("2D skyline runs only banded windows (no unpartitioned sort-the-world)") {
    val q = Queries.queries("lineitem_skyline_2d")(spark, sf)
    val plan = planString(q)
    assert(plan.contains("Window"), "expected the banded running-max windows")
    // formatted-mode Window argString is [exprs], [partitionSpec],
    // [orderSpec] — an empty partition spec prints as `], [], [`
    assert(!plan.contains("], [], ["),
      s"unpartitioned window crept into the skyline:\n${plan.take(3000)}")
  }

  test("RRF fusion is window-free with a TakeOrdered cut") {
    // (the lexical leg's bucket pruning is pinned by the BM25 test —
    // here the leg sits behind a localCheckpoint, so its scan is not
    // in the final plan's lineage)
    val plan = planString(Queries.queries("sim_rrf_fusion")(spark, sf))
    // ranks come from the broadcast count-of-better join, never a window
    assert(!plan.contains("Window"),
      s"RRF must be window-free (count-of-better ranks):\n${plan.take(2000)}")
    assert(plan.contains("TakeOrderedAndProject"),
      "expected TakeOrdered for the fused top-10 cut")
    // the one full-outer fuse join may SMJ — Spark has no broadcast
    // full-outer — but both its sides are <=k rows by construction
    // (each leg is the output of its own TakeOrdered), so the sort is
    // k-bounded; what must NOT SMJ is anything corpus-sized, i.e. the
    // count-of-better rank joins, which broadcast
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"rank count-of-better joins must broadcast:\n${plan.take(2000)}")
  }

  test("Hamming top-k: map-side bit packing, broadcast probe, TakeOrdered cut") {
    val plan = planString(Queries.queries("sim_hamming_topk")(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"probe must broadcast:\n${plan.take(1500)}")
    assert(plan.contains("TakeOrderedAndProject"),
      "expected TakeOrdered for the top-10 cut")
    assert(!plan.contains("SortMergeJoin"),
      s"nothing in the Hamming path may SMJ:\n${plan.take(1500)}")
    // the corpus side is scanned once: pack + score are one narrow pass
    assert(!plan.contains("Window"), "no window belongs in this plan")
  }

  test("segmentedRanks offsets are window-free even under a constant group") {
    import org.apache.spark.sql.functions._
    val d = spark.range(0, 1000)
      .select(col("id"), (col("id") % 97).as("v"))
      .withColumn("_g", lit(0))
    val r = graft.operators.Ranking.segmentedRanks(d, "_g", Seq("v", "id"))
    val plan = planString(r)
    // the only windows are the bucket-local rank windows, whose
    // partition spec carries _bkt — no `], [], [` empty spec anywhere
    // (FoldablePropagation folds the literal _g out of partitionSpec;
    // before the triangular-join offsets this printed empty specs)
    assert(!plan.contains("], [], ["),
      s"unpartitioned window in segmentedRanks:\n${plan.take(3000)}")
  }
}
