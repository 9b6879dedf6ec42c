package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan hygiene: the declarative queries must actually get the
  * optimizations the architecture leans on — parquet filter/column pushdown,
  * broadcast joins for small dims, whole-stage codegen — not just correct
  * results (builder prompt: ".explain the plan and iterate until it's the
  * plan you'd want").
  */
class PlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("plan-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q01 pushes the filter and prunes columns at the parquet scan") {
    val plan = planOf("q01_scan_project")
    assert(plan.contains("PushedFilters: [IsNotNull(l_orderkey), LessThan(l_orderkey,100)]"),
      s"filter not pushed:\n$plan")
    assert(plan.contains("ReadSchema") && !plan.contains("l_comment"),
      "projection must prune unused columns")
  }

  test("q02 pushes both predicates") {
    val plan = planOf("q02_filter")
    assert(plan.contains("EqualTo(event_type,click)") && plan.contains("GreaterThan(value,50.0)"),
      s"predicates not pushed:\n$plan")
  }

  test("q06 uses a broadcast hash join for the small dimension") {
    val plan = planOf("q06_join_broadcast")
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("q07/q08 plan as semi/anti joins, not generic joins") {
    assert(planOf("q07_semi_join").contains("LeftSemi"))
    assert(planOf("q08_anti_join").contains("LeftAnti"))
  }

  test("q03 aggregation is whole-stage codegen'd with partial aggregation") {
    val df = SparkEntry.queries("q03_agg_group")(spark, sf)
    df.collect() // finalize the adaptive plan so codegen spans are visible
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" is the WholeStageCodegen stage marker in the plan rendering
    assert(plan.contains("*(1)") || plan.contains("WholeStageCodegen"),
      s"agg must stay inside codegen:\n$plan")
    assert(plan.contains("partial_sum"),
      s"expected map-side partial aggregation:\n$plan")
  }

  test("q15 top-k plans as TakeOrderedAndProject, not a full sort") {
    val plan = planOf("q15_topk")
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$plan")
  }

  test("index build resolves posting ids through a codegen'd broadcast join") {
    import spark.implicits._
    val built = graft.index.IndexBuild.build(spark,
      graft.corpus.Corpus.generate(spark, 200), graft.corpus.Corpus.lexicon, parts = 4)
    val plan = built.blocks.queryExecution.executedPlan.toString
    // the urlHash -> doc_id resolve must be a BroadcastHashJoin (no shuffle,
    // whole-stage codegen), never a sort-merge join at broadcastable sizes
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected SMJ in:\n$plan")
  }

  test("q18 dedup hash-agg is partial (map-side combined)") {
    val plan = planOf("q18_dedup_exact")
    assert(plan.contains("HashAggregate") && plan.contains("partial"),
      s"expected partial hash aggregation:\n$plan")
  }

  test("q48 sequence packing stays distributed — no one-task global window") {
    import org.apache.spark.sql.functions.col
    val df = SparkEntry.queries("q48_seq_packing")(spark, sf)
    // the two-phase prefix sum must leave the result range-partitioned,
    // never collapsed through Window-over-SinglePartition
    assert(!df.queryExecution.executedPlan.toString.contains("Window"),
      "packing must not plan a window")
    assert(df.rdd.getNumPartitions > 1,
      s"expected multiple partitions, got ${df.rdd.getNumPartitions}")
    // pid stamping kept partitions aligned: ids are range-ordered, so
    // pack_id is globally nondecreasing in id order
    val rows = df.orderBy(col("doc_id")).collect().map(_.getLong(2))
    assert(rows.zip(rows.tail).forall { case (a, b) => a <= b },
      "pack ids must be nondecreasing in id order")
  }

  test("q49 stratified ranking windows per language, not over one partition") {
    val df = SparkEntry.queries("q49_quality_stratified")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"expected a window:\n$plan")
    assert(!plan.contains("SinglePartition"),
      s"per-language window must hash-partition on lang, not collapse:\n$plan")
  }

  test("q50 video frame explosion is a narrow map — no shuffle") {
    val plan = planOf("q50_video_frames")
    assert(!plan.contains("Exchange"),
      s"decode + frame explosion must not shuffle media bytes:\n$plan")
  }

  test("q55 line dedup: anti-join drop, partial aggs, no cartesian") {
    val df = SparkEntry.queries("q55_line_dedup")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"duplicate-line drop must be an anti join:\n$plan")
    assert(plan.contains("partial"), s"line count must map-side combine:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no all-pairs anywhere:\n$plan")
  }

  test("q57 more-like-this: query vectors broadcast, no cartesian") {
    val df = SparkEntry.queries("q57_more_like_this")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"query-side vectors must broadcast onto the postings:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no all-pairs scoring:\n$plan")
  }

  test("q58 link inversion: map-side combined aggs, html never joined") {
    val df = SparkEntry.queries("q58_anchor_text")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial"), s"inversion aggs must map-side combine:\n$plan")
    // the counts/terms join runs on aggregated rows keyed by target, and
    // column pruning reaches the scan (url never read, html only)
    assert(plan.linesIterator.exists(l => l.contains("Join [target") || l.contains("Join target")),
      s"join must key on the aggregated target column:\n$plan")
    // url rides along for the self-link filter; the row key must be pruned
    val read = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("html") && read.contains("url") && !read.contains("key"),
      s"scan must prune to (url, html):\n$plan")
  }

  test("q62 decontamination: benchmark grams broadcast, corpus text never shuffles wide") {
    val df = SparkEntry.queries("q62_decontaminate")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark gram set must broadcast onto the corpus grams:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no all-pairs:\n$plan")
    assert(plan.contains("partial"),
      s"per-doc hit count must map-side combine:\n$plan")
  }

  test("q63 PII redaction is a pure narrow projection — no shuffle, no UDF") {
    val plan = planOf("q63_pii_redact")
    assert(!plan.contains("Exchange"), s"redaction must not shuffle:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"regex masking must stay codegen'd builtins:\n$plan")
  }

  test("q64 mixture sampling: tiny rate table broadcast, no window, no sort") {
    val df = SparkEntry.queries("q64_mixture_sample")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"per-stratum rates must broadcast:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("Sort "),
      s"the hash coin needs no window or sort:\n$plan")
  }

  test("q65 LM scoring: count aggs partial, no cartesian") {
    val df = SparkEntry.queries("q65_lm_perplexity")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial"),
      s"model count aggs must map-side combine:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no all-pairs:\n$plan")
  }

  test("q71 as-of join is a union+window scan, never an inequality join") {
    val df = SparkEntry.queries("q71_asof_join")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"as-of must not plan as an inequality join:\n$plan")
    assert(plan.contains("Window"), s"expected the ordered window scan:\n$plan")
    // AQE's toString appends an "== Initial Plan ==" section — count
    // exchanges in the FINAL plan only
    val finalPlan = plan.split("== Initial Plan ==")(0)
    assert("Exchange hashpartitioning".r.findAllIn(finalPlan).size == 1,
      s"one shuffle on the key, total:\n$plan")
  }

  test("q72 quantiles: explode fuses, no cartesian, two bounded shuffles") {
    val df = SparkEntry.queries("q72_quantiles")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"rank window expected:\n$plan")
    assert(plan.contains("Generate explode"),
      s"p-list must explode inline, not join:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no all-pairs:\n$plan")
    assert("Exchange hashpartitioning".r
      .findAllIn(plan.split("== Initial Plan ==")(0)).size <= 2,
      s"window shuffle + tiny final agg only:\n$plan")
  }

  test("q73 cube expands grouping sets with map-side partial aggregation") {
    val df = SparkEntry.queries("q73_cube")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"cube must plan via Expand:\n$plan")
    assert(plan.contains("partial"),
      s"grouping sets must partially aggregate before the shuffle:\n$plan")
  }

  test("q74 recrawl delta fingerprints before the full-outer join") {
    val df = SparkEntry.queries("q74_recrawl_delta")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("FullOuter"), s"expected a full-outer join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"equi-join only:\n$plan")
    assert(plan.contains("md5"),
      s"fingerprint must be projected (shuffle carries md5, not text):\n$plan")
  }

  test("q77 weighted sample selects via TakeOrdered, not a global sort") {
    val plan = planOf("q77_weighted_sample")
    assert(plan.contains("TakeOrderedAndProject"),
      s"A-ES top-k must plan as TakeOrdered:\n$plan")
  }

  test("q78 coupling: hub cap pre-join, equi-join only, partial counts") {
    val df = SparkEntry.queries("q78_related_pages")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"pair generation must stay an equi-join on dst:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial"),
      s"pair counts must map-side combine:\n$plan")
  }

  test("q80 histogram: scalar min/max broadcast, no sort, partial counts") {
    val df = SparkEntry.queries("q80_histogram")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("rangepartitioning"),
      s"binning must not sort:\n$plan")
    assert(plan.contains("partial"),
      s"bin counts must map-side combine:\n$plan")
  }

  test("q81 salted join stays an equi-join on (key, salt)") {
    val df = SparkEntry.queries("q81_salted_join")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"salting must not degrade the join:\n$plan")
    assert(plan.contains("_salt"), s"salt lanes must be in the join key:\n$plan")
  }

  test("q84 term neighbors: variant equi-join, never a cross product") {
    val df = SparkEntry.queries("q84_term_neighbors")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"deletion neighborhoods must keep this an equi-join:\n$plan")
    assert(plan.contains("variant"),
      s"the variant string must drive the join:\n$plan")
  }

  test("q85 range join: bucket equi-join, never a nested loop") {
    val df = SparkEntry.queries("q85_range_join")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"bucketization must keep this an equi-join:\n$plan")
    assert(plan.contains("_bucket"),
      s"the bucket must drive the join:\n$plan")
  }

  test("q75 frontier: per-host window queue, no global sort") {
    val df = SparkEntry.queries("q75_frontier")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"per-host queue is a window:\n$plan")
    assert(!plan.contains("rangepartitioning"),
      s"politeness queues must not globally sort the frontier:\n$plan")
  }

  test("q92 triangles: equi-joins only, partial counts, no cartesian") {
    val df = SparkEntry.queries("q92_triangles")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"the oriented wedge join must stay an equi-join:\n$plan")
    assert(plan.contains("partial_count"),
      s"per-node counts must map-side combine:\n$plan")
  }

  test("q93 pivot: one pass with partial aggregation, no per-value scans") {
    val df = SparkEntry.queries("q93_pivot")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial"),
      s"pivot cells must map-side combine:\n$plan")
    // the pinned value list means NO distinct-scan of event_type first:
    // exactly one events scan in the FINAL plan (the AQE rendering repeats
    // the tree under "== Initial Plan ==" — don't double count it)
    val scans = plan.split("== Initial Plan ==")(0).split('\n').count(l =>
      l.contains("FileScan parquet") && l.contains("events"))
    assert(scans == 1, s"pivot must scan events exactly once, saw $scans:\n$plan")
  }

  test("q97 hll: one scan, map-side partial max, no UDF in the plan") {
    val df = SparkEntry.queries("q97_hll_registers")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_max"),
      s"registers must map-side combine:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"the portable hash must stay a built-in expression:\n$plan")
  }

  test("q98 count-min: partial counts, no UDF") {
    val df = SparkEntry.queries("q98_countmin")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_count"),
      s"counters must map-side combine:\n$plan")
    assert(!plan.contains("ScalaUDF"), s"no UDF expected:\n$plan")
  }

  test("q94 z-order key is pure whole-stage-codegen projection — no shuffle") {
    val df = SparkEntry.queries("q94_zorder_key")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"the key is a narrow map:\n$plan")
    assert(plan.contains("*(1)") || plan.contains("WholeStageCodegen"),
      s"shift/mask interleave must codegen:\n$plan")
  }

  test("q104 sharded serving: per-term weights broadcast, top-k via TakeOrdered, no cartesian") {
    import spark.implicits._
    val lex = spark.sparkContext.broadcast(graft.corpus.Corpus.lexicon)
    val triples = graft.corpus.Corpus.generate(spark, 100).flatMap { p =>
      graft.text.Text.postings(p.url, new String(p.html, "UTF-8"), lex.value)
        .map { case (t, tf) => (p.url, t, tf) }
    }.toDF("url", "term", "tf")
    val df = graft.query.ShardedSearch.topK(spark, triples, 100,
      "galaxy engine search", shards = 4)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the term-literal dimension must broadcast onto the postings:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"final top-k must never be a global sort:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no all-pairs anywhere:\n$plan")
  }

  test("q110 boilerplate: per-source anti-join drop, partial aggs, no cartesian") {
    val df = SparkEntry.queries("q110_boilerplate")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"chrome drop must be an anti join:\n$plan")
    assert(plan.contains("partial"), s"line counts must map-side combine:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no all-pairs anywhere:\n$plan")
  }

  test("q111 trap detection: partial aggregation, top-k via TakeOrdered") {
    val df = SparkEntry.queries("q111_trap_detect")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial"), s"template counts must map-side combine:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"ranked output must never be a global sort:\n$plan")
  }

  test("q150 federated: query terms + shard stats broadcast, partial aggs, no cartesian") {
    val df = SparkEntry.queries("q150_federated_search")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"query-term and shard-stat dims must broadcast:\n$plan")
    assert(plan.contains("partial"),
      s"shard-local stats must map-side combine:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no all-pairs anywhere:\n$plan")
  }

  test("q143 clarity: equi-joined grid, partial aggs, no cartesian") {
    val df = SparkEntry.queries("q143_clarity")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial"),
      s"feedback-LM counts must map-side combine:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no all-pairs anywhere:\n$plan")
  }

  test("q147 politeness: per-host window, never a global frontier sort") {
    val df = SparkEntry.queries("q147_politeness")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"per-host spacing is a window:\n$plan")
    assert(!plan.contains("rangepartitioning"),
      s"politeness schedules must not globally sort the frontier:\n$plan")
  }

  test("q144 corpus laws: top-R terms via TakeOrdered, checkpoint-pruned doc ranks") {
    val df = SparkEntry.queries("q144_corpus_laws")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"Zipf's top-R must never be a global sort:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"the checkpoint probe must be a broadcast range join, not all-pairs:\n$plan")
  }

  test("q148 ab test: one scan with map-side partial counts, no join at all") {
    val df = SparkEntry.queries("q148_ab_test")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial"),
      s"arm counts must map-side combine:\n$plan")
    // the readout sorts only its own cohort-count-sized output; the log
    // itself is one agg pass — no join operator may appear
    assert(!plan.contains("Join"), s"the readout is one agg pass:\n$plan")
  }
}
