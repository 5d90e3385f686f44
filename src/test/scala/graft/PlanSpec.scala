package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Physical-plan shape assertions — the 100 TB design contract:
  * filters/projections reach the parquet scan, small dims broadcast,
  * window specs share WindowExec nodes, nothing cartesian except the
  * intentional tiny-query-side ANN cross join.
  */
class PlanSpec extends SparkSpec {

  private def physical(df: DataFrame): SparkPlan = {
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
  }

  private def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] =
    p.collect(pf) ++ p.subqueries.flatMap(collectAll(_)(pf))

  /** Exchanges excluding the cores-adaptive scan fan-out
    * (Tables.fanOut): a RoundRobinPartitioning repartition carries no
    * key — it only spreads single-row-group fixture scans across cores —
    * so the shape pins below keep counting what they always counted:
    * DATA-DEPENDENT (hash/range) shuffles.
    */
  private def dataExchanges(p: SparkPlan): Seq[Exchange] =
    collectAll(p) { case e: Exchange => e }.filterNot(
      _.outputPartitioning.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning])

  private def fmt(df: DataFrame): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
    out.toString
  }

  test("scan_watermark_pushdown: timestamp filter is pushed to the parquet scan") {
    val plan = fmt(Queries.all("scan_watermark_pushdown").fn(spark, sf0001))
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate"),
      s"filter not pushed:\n$plan")
  }

  test("sma: scan reads only the columns the query needs") {
    val plan = fmt(Queries.all("sma").fn(spark, sf0001))
    val readSchema = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(readSchema.contains("l_extendedprice"))
    // l_linestatus is the one lineitem column no ohlcv query needs — it
    // must be pruned from the scan
    assert(!readSchema.contains("l_linestatus"), s"unpruned read schema: $readSchema")
  }

  test("join_symbol_dim: dims join via BroadcastHashJoin, no shuffle on dims") {
    val p = physical(Queries.all("join_symbol_dim").fn(spark, sf0001))
    val bhj = collectAll(p) { case b: BroadcastHashJoinExec => b }
    assert(bhj.size == 2, s"expected 2 broadcast joins, got ${bhj.size}")
  }

  test("indicator pipeline shares WindowExec nodes across same-frame functions") {
    val df = SparkEntry.entry(spark)
    val p = physical(df)
    val windows = collectAll(p) { case w: WindowExec => w }
    // 15 indicator expressions collapse into a handful of WindowExec nodes
    // (one per distinct frame spec), not one per withColumn
    assert(windows.nonEmpty && windows.size <= 6,
      s"expected <=6 WindowExec nodes, got ${windows.size}")
    // and they all share ONE exchange (same partitioning by symbol)
    val exchanges = dataExchanges(p)
    assert(exchanges.size <= 2, s"expected <=2 exchanges, got ${exchanges.size}")
  }

  test("no unintentional cartesian or nested-loop joins anywhere in the inventory") {
    // BroadcastNestedLoopJoin is the other per-pair scale killer (a
    // non-equi join Catalyst could not hash) — allowed only where a key
    // intentionally crosses a bounded literal-sized side
    val allowed = Set(
      "similarity_topk", // intentional: tiny broadcast query side
      "perplexity_buckets", // one-row corpus-count crossed into the cutoff table
      "bigram_logprob", "bigram_logprob_prod", "unigram_logprob", // one-row total-count cross
      "dsir_select", "dsir_select_prod", // one-row totals cross
      "ffill_calendar", // 3-row bounds frame
      "char_entropy", "fulltext_bm25", "fulltext_bm25_served", // one-row stats cross
      "corpus_stats", "corpus_stats_approx", "corpus_stats_kmv",
      "mix_sources", "quality_filter", "text_stats",
      // IVF family: assignment/probing is the corpus × K-row-broadcast
      // centroid cross — linear in N·K by construction, the standard
      // coarse-quantizer scoring shape
      "ann_ivf_topk", "ann_ivf_trained_topk", "ann_ivf_append", "ann_ivfpq_topk",
      "semantic_dedup", "cluster_sample", // same K-row codebook cross
      "tfidf_topk", // one-row corpus doc-count cross
      "triangle_count", "triangle_count_approx") // three one-row stat aggregates crossed into one row
    val offenders = Queries.all.toSeq.flatMap { case (name, q) =>
      if (allowed(name)) Nil
      else {
        val p = physical(q.fn(spark, sf0001))
        val cart = collectAll(p) { case c: CartesianProductExec => c }
        val bnlj = collectAll(p) {
          case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
        }
        (if (cart.nonEmpty) Seq(s"$name:cartesian") else Nil) ++
          (if (bnlj.nonEmpty) Seq(s"$name:bnlj") else Nil)
      }
    }
    assert(offenders.isEmpty,
      s"unexpected per-pair joins: ${offenders.sorted.mkString(", ")}")
  }

  test("per-row corpus ops shuffle only for the final output sort") {
    // these keys claim zero-shuffle computation: the ONLY exchange in
    // their plans must be the range partitioning of the output ORDER BY —
    // a hash exchange would mean an accidental aggregation/join slipped in
    val perRow = Seq("pii_scrub", "quality_filter", "text_normalize",
      "text_stats", "repetition_stats", "lang_id", "doc_fingerprint",
      "embedding_quantize", "dataset_split", "stratified_sample_hash",
      "multimodal_meta")
    perRow.foreach { name =>
      val p = physical(Queries.all(name).fn(spark, sf0001))
      val ex = dataExchanges(p)
      assert(ex.size <= 1, s"$name: ${ex.size} exchanges")
      ex.foreach(e => assert(
        e.outputPartitioning.toString.toLowerCase.contains("range"),
        s"$name computation shuffles: ${e.outputPartitioning}"))
    }
  }

  test("corpus_stats_kmv: bottom-k aggregates partially map-side, no vocabulary shuffle") {
    val p = physical(Queries.all("corpus_stats_kmv").fn(spark, sf0001))
    // one hash exchange on lang (carrying ≤k longs per lang per map task)
    // plus the output ORDER BY's range exchange — a distinct/extra hash
    // exchange would mean the sketch regressed to an exact-DISTINCT plan
    val ex = dataExchanges(p)
    assert(ex.size <= 2, s"${ex.size} exchanges (want ≤2)")
    assert(ex.count(_.outputPartitioning.toString.toLowerCase.contains("hash")) <= 1,
      s"extra hash exchange: ${ex.map(_.outputPartitioning)}")
    // the typed-imperative aggregate must run two-phase (partial below the
    // exchange, final above) so the vocabulary never leaves the map side
    val objAggs = collectAll(p) {
      case o: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => o
    }
    assert(objAggs.size >= 2,
      s"expected partial+final ObjectHashAggregate, got ${objAggs.size}")
  }

  test("fulltext_bm25: corpus scanned once for scoring, stats aside; no SMJ") {
    val p = physical(Queries.all("fulltext_bm25").fn(spark, sf0001))
    // exactly TWO scans of documents are allowed: the scoring pass and
    // the one-row (N, avgdl) stats aggregate. A third means the df
    // computation regressed to the groupBy + self-join form that
    // re-executes the matched subtree (a full corpus pass at scale).
    val scans = collectAll(p) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
        if s.toString.contains("documents") => s
    }
    assert(scans.size == 2, s"documents scanned ${scans.size}x (want 2)")
    val plan = fmt(Queries.all("fulltext_bm25").fn(spark, sf0001))
    assert(!plan.contains("SortMergeJoin"), "query-term joins must broadcast")
    assert(!plan.contains("CartesianProduct"), "cartesian in bm25")
  }

  test("fulltext_bm25_served: postings scan is bucket-pruned, corpus never touched") {
    val df = Queries.all("fulltext_bm25_served").fn(spark, sf0001)
    val p = physical(df)
    // the serving plan must read the persisted postings/stats tables ONLY
    // — a documents.parquet scan would mean serving regressed to a
    // corpus pass
    val docScans = collectAll(p) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
        if s.toString.contains("documents.parquet") => s
    }
    assert(docScans.isEmpty, "serving path re-scanned the corpus")
    // bucket pruning: term IN (<query terms>) selects k of 16 buckets
    val postingsScan = collectAll(p) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
        if s.metadata.get("Location").exists(_.contains("bm25_postings")) => s
    }
    assert(postingsScan.nonEmpty, "no postings table scan found")
    val selected = postingsScan.head.metadata.get("SelectedBucketsCount")
    assert(selected.isDefined, s"bucket pruning missing: ${postingsScan.head.metadata}")
    val k = selected.get.trim.split(" ")(0).toInt
    assert(k < 16, s"expected pruned bucket scan, got $selected")
    // and the served results are bit-equal to the scan path
    val scan = Queries.all("fulltext_bm25").fn(spark, sf0001).collect().toSeq
    assert(df.collect().toSeq == scan, "served BM25 diverged from scan path")
  }

  test("ann_ivfpq_served: persisted index read prunes unprobed cells' partitions") {
    // Pruning is observable at PER-QUERY granularity: the batch key's
    // scan filter is the union of 10 queries' 6-of-8 probe sets, which
    // deterministically covers all 8 cells at this fixture — nothing
    // left to prune there (and asserting otherwise can never pass). The
    // production serving read is one query's probe set; pin pruning on
    // that path: the scan must carry the c_id partition filter and
    // select exactly the nProbe probed cells, fewer than the K on disk.
    val (one, qid, nCells, k) = QueriesScale.ivfPqServeOneFromIndex(spark, sf0001)
    val oneScans = collectAll(physical(one)) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
        if s.metadata.get("Location").exists(_.contains("ivfpq_res_index")) => s
    }
    assert(oneScans.nonEmpty, "no persisted-index scan found")
    oneScans.foreach { s =>
      assert(s.partitionFilters.nonEmpty, s"no partition filter: ${s.metadata}")
      val read = s.selectedPartitions.partitionCount
      assert(read == nCells && read < k,
        s"expected $nCells of $k probed cell partitions, got $read")
    }
    // The batch key still reads ONLY the persisted index (never re-codes
    // the corpus) and carries the partition filter at the scan.
    val df = Queries.all("ann_ivfpq_served").fn(spark, sf0001)
    val idxScans = collectAll(physical(df)) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
        if s.metadata.get("Location").exists(_.contains("ivfpq_res_index")) => s
    }
    assert(idxScans.nonEmpty, "no persisted-index scan found")
    idxScans.foreach { s =>
      assert(s.partitionFilters.nonEmpty, s"no partition filter: ${s.metadata}")
    }
    // bit-equal to the in-memory form (integer codes round-trip parquet)
    val mem = Queries.all("ann_ivfpq_topk").fn(spark, sf0001).collect().toSeq
    assert(df.collect().toSeq == mem, "served IVF-PQ diverged from in-memory form")
    // and the single-query path returns exactly that query's batch rows
    val memOne = mem.filter(_.getLong(0) == qid)
    assert(one.collect().toSeq == memOne,
      "single-query served read diverged from batch rows")
  }

  test("ann_filtered_served: (label, cell) index prunes on BOTH dimensions; recall holds") {
    // per-query read: exactly the query's label branch and its nProbe
    // cells are selected out of labels×K partition directories
    val (one, qid, nCells, totalParts) = QueriesScale.ivfFilteredServeOne(spark, sf0001)
    val scans = collectAll(physical(one)) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
        if s.metadata.get("Location").exists(_.contains("ivfpq_lbl_res_index")) => s
    }
    assert(scans.nonEmpty, "no filtered-index scan found")
    scans.foreach { s =>
      assert(s.partitionFilters.nonEmpty, s"no partition filter: ${s.metadata}")
      val read = s.selectedPartitions.partitionCount
      assert(read == nCells && read < totalParts,
        s"expected $nCells of $totalParts (label,cell) partitions, got $read")
    }
    // results respect the metadata filter: every neighbor carries the
    // query's label (checked via the exact filtered key, which it must
    // also approximate well — mean recall@10 ≥ 0.8, measured 0.94)
    val served = Queries.all("ann_filtered_served").fn(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val exact = Queries.all("ann_filtered_topk").fn(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val exactByQ = exact.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val servedByQ = served.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exactByQ.map { case (q, want) =>
      (servedByQ(q) & want).size.toDouble / want.size
    }
    assert(recalls.sum / recalls.size >= 0.8,
      s"filtered recall collapsed: ${recalls.sum / recalls.size}")
    // every served neighbor the exact filtered key also knows carries the
    // query's label by construction of that key; a cross-label leak would
    // surface as a recall gap AND a rank-1 self-retrieval break below
    val rank1 = Queries.all("ann_filtered_served").fn(spark, sf0001)
      .filter(org.apache.spark.sql.functions.col("rank") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rank1.forall { case (q, v) => q == v }, "self-retrieval broken")
    // and the single-query path returns that query's batch rows
    val batchOne = Queries.all("ann_filtered_served").fn(spark, sf0001)
      .collect().filter(_.getLong(0) == qid).toSeq
    assert(one.collect().toSeq == batchOne,
      "single-query filtered read diverged from batch rows")
  }

  test("media metadata keys: one corpus scan, parse in projection, shuffle only for the output sort") {
    // the round-14 document/container keys join the contract: decode
    // happens in the projection (or an explode over it); the only
    // exchange is the gate's output ORDER BY
    Seq("image_meta", "audio_meta", "container_meta", "pdf_text",
      "tar_members", "zip_entries", "opus_packets", "subtitle_text",
      "mp4_frag_samples", "webdataset_image_stats", "epub_text",
      "jsonl_corpus", "robots_allowed").foreach { k =>
      val p = physical(Queries.all(k).fn(spark, sf0001))
      val scans = collectAll(p) {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scans.size == 1, s"$k scanned ${scans.size} sources (want 1)")
      // header parsing is per-row projection work: the ONLY exchange the
      // plan may carry is the gate's deterministic ORDER BY — a second
      // one would mean the parse path regressed into an agg or join
      val exchanges = dataExchanges(p)
      assert(exchanges.size == 1,
        s"$k has ${exchanges.size} exchanges (want only the output sort)")
      assert(collectAll(p) { case w: WindowExec => w }.isEmpty,
        s"$k grew a window")
    }
  }

  test("minhash/simhash band joins are equi-joins (shuffle on compact keys)") {
    Seq("minhash_dedup", "minhash_dedup_prod", "simhash_neardup").foreach { name =>
      val plan = fmt(Queries.all(name).fn(spark, sf0001))
      assert(!plan.contains("CartesianProduct"), s"$name is cartesian")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$name is nested-loop")
    }
  }

  test("dedup_pipeline: all joins shuffled-hash, no subtree duplication, one global sort") {
    Seq("dedup_pipeline", "dedup_pipeline_prod").foreach { name =>
      val p = physical(Queries.all(name).fn(spark, sf0001))
      val cart = collectAll(p) { case c: CartesianProductExec => c }
      assert(cart.isEmpty, s"$name has a cartesian product")
      // every join in the pipeline is pinned shuffled-hash: AQE's runtime
      // stats see few ROWS on the corpus-shingle projection and would
      // otherwise flip the verify joins to broadcast — corpus-sized in
      // BYTES (each row carries the doc's full shingle array) — and a
      // broadcast future severs exchange reuse. Exactly 3: two verify
      // joins + the survivor left-outer join. More than 3 would mean the
      // pipeline subtree got duplicated again (the anti-through-union
      // pushdown this plan is shaped to avoid); an anti join present
      // would mean the left-outer formulation regressed.
      val shj = collectAll(p) {
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      }
      assert(shj.size == 3, s"$name: expected 3 shuffled-hash joins, got ${shj.size}")
      val anti = collectAll(p) {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec
          if j.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti => j
      }
      assert(anti.isEmpty, s"$name: anti join resurfaced (union-pushdown hazard)")
      // exactly one GLOBAL sort: the user-facing ORDER BY — any other
      // would mean a hidden total sort of corpus-sized data
      val globalSorts = collectAll(p) {
        case s: org.apache.spark.sql.execution.SortExec if s.global => s
      }
      assert(globalSorts.size == 1, s"$name: ${globalSorts.size} global sorts")
    }
  }

  test("crawl_dedup_pipeline: extraction is exchange-free; dedup tail matches dedup_pipeline") {
    val p = physical(Queries.all("crawl_dedup_pipeline").fn(spark, sf0001))
    val cart = collectAll(p) { case c: CartesianProductExec => c }
    assert(cart.isEmpty, "cartesian product in the crawl pipeline")
    // the WARC→HTTP-strip→HTML-extract chain is a single projection —
    // the composed pipeline must carry EXACTLY the dedup tail's shuffle
    // structure (3 pinned shuffled-hash joins) and nothing more: an
    // extra hash exchange would mean extraction accidentally aggregated
    // or re-partitioned corpus-sized data
    val shj = collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    assert(shj.size == 3, s"expected 3 shuffled-hash joins, got ${shj.size}")
    val globalSorts = collectAll(p) {
      case s: org.apache.spark.sql.execution.SortExec if s.global => s
    }
    assert(globalSorts.size == 1, s"${globalSorts.size} global sorts")
    // and the extraction stage alone never shuffles: per-row decode
    val w = graft.operators.ScaleOps.warcRecords(
      graft.operators.ScaleOps.synthWarcHtmlGz(
        org.apache.spark.sql.functions.col("doc_id")))
    val corpus = Tables.documents(spark, sf0001)
      .select(org.apache.spark.sql.functions.col("doc_id"), w.as("w"))
    val ex = dataExchanges(physical(corpus))
    assert(ex.isEmpty, s"extraction shuffles: ${ex.size} exchanges")
  }

  test("r15 document keys: per-row extraction plans stay exchange-free until the output sort") {
    // the 100 TB contract for every new modality key: one projection
    // over the corpus — decode work happens inside the expression, and
    // the ONLY exchange in the whole query is the final presentation
    // orderBy (url_canonical additionally carries its intentional
    // group-by; it is pinned separately below)
    for (key <- Seq("docx_text", "odt_text", "pptx_text", "xlsx_cells",
      "rtf_text", "markdown_text", "eml_message", "mbox_messages",
      "main_content", "sitemap_urls", "feed_entries", "robots_sitemaps")) {
      val p = physical(Queries.all(key).fn(spark, sf0001))
      assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty,
        s"$key plans a cartesian product")
      val ex = dataExchanges(p)
      assert(ex.size <= 1, s"$key: ${ex.size} exchanges — decode must not shuffle")
      val aggs = collectAll(p) {
        case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
      }
      assert(aggs.isEmpty, s"$key: unexpected aggregation in a per-row key")
    }
    // url_canonical: exactly one hash exchange (the canonical group-by,
    // map-side combined) + the output sort — never a corpus self-join
    val p = physical(Queries.all("url_canonical").fn(spark, sf0001))
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty)
    val shuffles = dataExchanges(p)
    assert(shuffles.size <= 2, s"url_canonical: ${shuffles.size} shuffles")
    val aggs = collectAll(p) {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
    }
    assert(aggs.nonEmpty && aggs.size <= 2,
      s"url_canonical: expected the partial+final group-by pair, got ${aggs.size}")
  }

  test("unigram_logprob: Zipf split-join — head broadcast, tail shuffle-hash, one-row total") {
    val p = physical(Queries.all("unigram_logprob").fn(spark, sf0001))
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty)
    // the rare-tail resolve is the ONLY shuffled join on a term-derived
    // key, and it must be hash (hinted), never sort-merge: sorting the
    // exploded token stream by term would be a corpus-sized sort
    val shj = collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    assert(shj.size == 1, s"expected 1 shuffled-hash tail join, got ${shj.size}")
    // head terms and the head-exclusion filter broadcast (Zipf head
    // carries the token mass map-side, absorbing the term skew)
    val bhj = collectAll(p) { case j: BroadcastHashJoinExec => j }
    assert(bhj.size >= 2, s"expected >=2 broadcast head joins, got ${bhj.size}")
    // the corpus-mass denominator is a single-row broadcast — the one
    // tolerated nested-loop — and nothing else nested-loops
    val bnlj = collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }
    assert(bnlj.size == 1, s"expected exactly the one-row total BNLJ, got ${bnlj.size}")
    // two corpus scans: tokenize+score, and the final score-attach join
    // (the freq model is checkpointed, so it costs no documents scan here)
    val scans = collectAll(p) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
        if s.toString.contains("documents") => s
    }
    assert(scans.size == 2, s"documents scanned ${scans.size}x (want 2)")
  }

  test("dedup_cc: final clustering join over a checkpointed star forest, no cartesian") {
    // the iterative large-star/small-star rounds have already run (and
    // localCheckpoint truncated their lineage) by the time the query's
    // DataFrame exists — the final plan must be corpus ⟕ (node, rep)
    // with nothing quadratic and the single user-facing ORDER BY
    Seq("dedup_cc", "dedup_cc_prod").foreach { name =>
      val p = physical(Queries.all(name).fn(spark, sf0001))
      val cart = collectAll(p) { case c: CartesianProductExec => c }
      assert(cart.isEmpty, s"$name has a cartesian product")
      val bnl = collectAll(p) {
        case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      }
      assert(bnl.isEmpty, s"$name has a nested-loop join")
      // the heavy signature/verify pipeline is fully materialized behind
      // the checkpoint: the remaining plan holds exactly the one
      // clustering join
      val joins = collectAll(p) {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
      }
      assert(joins.size == 1, s"$name: expected 1 join after checkpoint, got ${joins.size}")
      val globalSorts = collectAll(p) {
        case s: org.apache.spark.sql.execution.SortExec if s.global => s
      }
      assert(globalSorts.size == 1, s"$name: ${globalSorts.size} global sorts")
    }
  }

  test("pack_sequences: one hash exchange (the packing streams) + output sort only") {
    val p = physical(Queries.all("pack_sequences").fn(spark, sf0001))
    val ex = dataExchanges(p)
    // the cumsum needs exactly one hash partitioning on (lang, shard);
    // the only other exchange is the ORDER BY's range partitioning — a
    // second hash exchange would mean the window keys don't line up and
    // the corpus is being reshuffled
    val hash = ex.filterNot(_.outputPartitioning.toString.toLowerCase.contains("range"))
    assert(hash.size == 1, s"pack_sequences: ${hash.size} hash exchanges")
    assert(ex.size <= 2, s"pack_sequences: ${ex.size} exchanges total")
  }

  test("decontaminate: benchmark shingle set joins via broadcast hash join") {
    val p = physical(Queries.all("decontaminate").fn(spark, sf0001))
    // the bounded benchmark side must broadcast — a shuffle-hash or
    // sort-merge join here would shuffle the exploded CORPUS shingles,
    // which at 100 TB is a corpus-sized exchange of raw n-gram text
    val bhj = collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }
    assert(bhj.nonEmpty, "no BroadcastHashJoin in decontaminate plan")
    val cart = collectAll(p) { case c: CartesianProductExec => c }
    assert(cart.isEmpty, "decontaminate has a cartesian product")
  }

  test("IVF codebook expansion is broadcast; no cartesian against the corpus") {
    // semantic_dedup shares the codebook-expansion shape: its cluster
    // assignment must also be a broadcast of the K-row codebook, never a
    // corpus-side cartesian
    Seq("ann_ivf_topk", "ann_ivf_trained_topk", "semantic_dedup").foreach { name =>
      val p = physical(Queries.all(name).fn(spark, sf0001))
      // the K-row codebook joins the corpus via an explicit
      // broadcast(cents) cross — physical BroadcastNestedLoopJoin with
      // the tiny side built, the deliberate K×-expansion of assignment.
      // What must NEVER appear is an unbroadcast CartesianProduct (a
      // corpus×corpus or shuffle-side expansion).
      val bcastJoins = collectAll(p) {
        case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
        case b: BroadcastHashJoinExec => b
      }
      assert(bcastJoins.nonEmpty, s"$name: codebook join is not broadcast")
      val cart = collectAll(p) { case c: CartesianProductExec => c }
      assert(cart.isEmpty, s"$name has a cartesian product")
    }
  }

  test("dsir_select: broadcast scoring join, TakeOrdered top-k, no corpus sort") {
    Seq("dsir_select", "dsir_select_prod").foreach { name =>
      val p = physical(Queries.all(name).fn(spark, sf0001))
      assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty)
      // the per-feature scoring join must broadcast the <=4096-row bucket
      // weight table — a shuffle here would move the exploded feature
      // stream (corpus-sized) by bucket
      val bhj = collectAll(p) { case j: BroadcastHashJoinExec => j }
      assert(bhj.nonEmpty, s"$name: scoring join must broadcast the weight table")
      // top-k plans as TakeOrderedAndProject: per-partition heaps + a
      // k-row driver merge, never a global sort of all scored docs
      val tops = collectAll(p) {
        case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
      }
      assert(tops.size == 1, s"$name: expected 1 TakeOrdered, got ${tops.size}")
      val globalSorts = collectAll(p) {
        case s: org.apache.spark.sql.execution.SortExec if s.global => s
      }
      assert(globalSorts.isEmpty, s"$name: orderBy+limit became a global sort")
    }
  }

  test("range_join: bucket decomposition yields an equi-join, never nested-loop") {
    // the whole point of RangeJoin is to keep the range condition OFF the
    // join operator — a BroadcastNestedLoopJoin here means the bucket
    // equi-keys were lost and the plan degenerated to O(bars × orders)
    val plan = fmt(Queries.all("range_join").fn(spark, sf0001))
    assert(!plan.contains("BroadcastNestedLoopJoin"), "range join is nested-loop")
    assert(!plan.contains("CartesianProduct"), "range join is cartesian")
  }

  test("dup_ngram_fraction: df join is shuffle-hash on the shingle key, no pair expansion") {
    Seq("dup_ngram_fraction", "dup_ngram_fraction_prod").foreach { name =>
      val p = physical(Queries.all(name).fn(spark, sf0001))
      val shj = collectAll(p) {
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      }
      assert(shj.nonEmpty, s"$name: df join must stay shuffle-hash " +
        "(broadcast would materialize the corpus-wide df table per executor)")
      assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty)
    }
  }

  test("beyond-reference indicators stay single-window, two-exchange plans") {
    // vwap/drawdown/stochastic/atr: one per-symbol window exchange + the
    // output range sort — a third exchange would mean an accidental
    // aggregation or a split window spec
    Seq("vwap", "drawdown", "stochastic", "atr", "anomaly_zscore").foreach { name =>
      val p = physical(Queries.all(name).fn(spark, sf0001))
      val ex = dataExchanges(p)
      assert(ex.size <= 2, s"$name: ${ex.size} exchanges")
      val windows = collectAll(p) { case w: WindowExec => w }
      assert(windows.size <= 2, s"$name: ${windows.size} windows")
    }
  }

  test("winsorize: band table broadcasts back, one rank window") {
    val p = physical(Queries.all("winsorize").fn(spark, sf0001))
    val bhj = collectAll(p) { case b: BroadcastHashJoinExec => b }
    assert(bhj.nonEmpty, "per-symbol bands must broadcast, not shuffle the rows")
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty)
  }

  test("mix_sources: quota table broadcasts, corpus is never shuffled for it") {
    val p = physical(Queries.all("mix_sources").fn(spark, sf0001))
    val bhj = collectAll(p) { case b: BroadcastHashJoinExec => b }
    assert(bhj.nonEmpty, "quota join must broadcast the per-source table")
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty)
  }

  test("rolling_corr: six window aggregates fuse into one pair-window node") {
    val p = physical(Queries.all("rolling_corr").fn(spark, sf0001))
    val windows = collectAll(p) { case w: WindowExec => w }
    // 2 per-symbol lag windows (the self-joined return subtree runs twice
    // — inherent to a pair join without caching) + exactly ONE fused
    // window for all six Σ aggregates; more means the withColumn-split
    // regression returned
    assert(windows.size == 3, s"expected 3 WindowExec nodes, got ${windows.size}")
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty)
  }

  test("resample_ohlc: dedup is a struct-max aggregation, not a sorting window") {
    val p = physical(Queries.all("resample_ohlc").fn(spark, sf0001))
    // keep-latest via max(struct) — a WindowExec here means the dedup
    // regressed to row_number, which sorts the full-width frame
    val windows = collectAll(p) { case w: WindowExec => w }
    assert(windows.isEmpty, s"expected no WindowExec, got ${windows.size}")
    // daily hash exchange + weekly hash exchange + output range sort
    val ex = dataExchanges(p)
    assert(ex.size <= 3, s"expected <=3 exchanges, got ${ex.size}")
  }

  test("profile_table: five exact distincts rewrite to ONE scan via Expand") {
    val p = physical(Queries.all("profile_table").fn(spark, sf0001))
    val scans = collectAll(p) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.size == 1,
      s"profiler must be one corpus pass, got ${scans.size} scans")
    val expands = collectAll(p) {
      case e: org.apache.spark.sql.execution.ExpandExec => e
    }
    assert(expands.size == 1,
      s"multi-distinct should plan as one Expand, got ${expands.size}")
  }

  test("quantile_stats: rank selection, no join, no cartesian") {
    val p = physical(Queries.all("quantile_stats").fn(spark, sf0001))
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty)
    val windows = collectAll(p) { case w: WindowExec => w }
    assert(windows.size <= 2, s"expected <=2 windows (rank + count), got ${windows.size}")
  }

  test("tfidf_topk: df join is shuffle-hash on term; corpus count broadcasts") {
    val p = physical(Queries.all("tfidf_topk").fn(spark, sf0001))
    val shj = collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    assert(shj.nonEmpty, "Zipf-skewed term join must be shuffle-hash, not sort-merge")
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty)
    // the only nested-loop is the broadcast of the single-row n_docs count
    val bnl = collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }
    assert(bnl.size <= 1, s"unexpected nested-loop joins: ${bnl.size}")
  }

  test("ann_pq_topk: codes + literal LUT scoring, candidates broadcast back, no cartesian") {
    val p = physical(Queries.all("ann_pq_topk").fn(spark, sf0001))
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty)
    // re-rank joins: the ≤400-row candidate set and the 10-row query
    // table broadcast — the corpus is never shuffled for a join
    val bhj = collectAll(p) { case b: BroadcastHashJoinExec => b }
    assert(bhj.size == 2, s"expected 2 broadcast joins, got ${bhj.size}")
    assert(collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }.isEmpty && !fmt(Queries.all("ann_pq_topk").fn(spark, sf0001))
      .contains("SortMergeJoin"), "corpus must not shuffle for the re-rank")
  }

  test("line_dedup: first-occurrence is a two-phase aggregate joined shuffle-hash, no window") {
    val p = physical(Queries.all("line_dedup").fn(spark, sf0001))
    // a WindowExec would mean first-occurrence regressed to min-over-
    // partition(line) — the hot-boilerplate skew wall; the aggregate
    // form partial-aggregates map-side
    assert(collectAll(p) { case w: WindowExec => w }.isEmpty, "unexpected window")
    assert(collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }.nonEmpty, "join back must be shuffle-hash on the compact line hash")
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty)
  }

  test("embedding_project: per-row projections, only the output sort shuffles") {
    val p = physical(Queries.all("embedding_project").fn(spark, sf0001))
    val ex = dataExchanges(p)
    assert(ex.size <= 1, s"expected only the ORDER BY exchange, got ${ex.size}")
    val windows = collectAll(p) { case w: WindowExec => w }
    assert(windows.isEmpty, "no window should appear in a per-row projection")
  }

  test("scd2_history: both window passes ride ONE custkey exchange") {
    val p = physical(Queries.all("scd2_history").fn(spark, sf0001))
    val windows = collectAll(p) { case w: WindowExec => w }
    assert(windows.size == 2, s"expected lag + lead/version windows, got ${windows.size}")
    // one shuffle on o_custkey + the output range partitioning — the
    // change-row filter preserves distribution, so the second WindowExec
    // must NOT introduce a new exchange
    val ex = dataExchanges(p)
    assert(ex.size <= 2, s"expected <=2 exchanges (custkey + ORDER BY), got ${ex.size}")
  }

  test("ffill_calendar: calendar densification never cartesians, fill is one window") {
    val p = physical(Queries.all("ffill_calendar").fn(spark, sf0001))
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty)
    val windows = collectAll(p) { case w: WindowExec => w }
    assert(windows.size == 1, s"expected one forward-fill window, got ${windows.size}")
  }

  test("pivot_close: explicit value list keeps the pivot a single-aggregate plan") {
    val df = Queries.all("pivot_close").fn(spark, sf0001)
    val p = physical(df)
    // with the symbol list passed explicitly there is no distinct-values
    // job and no join — the matrix is aggregates only (daily dedup +
    // pivot), two data exchanges plus the output sort at most
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty)
    assert(!fmt(df).contains("Join"), "pivot must not plan any join")
    val ex = dataExchanges(p)
    assert(ex.size <= 3, s"expected <=3 exchanges (dedup, pivot, sort), got ${ex.size}")
  }

  test("ngram_counts_approx: candidate re-count filters via broadcast before aggregating") {
    val p = physical(Queries.all("ngram_counts_approx").fn(spark, sf0001))
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty)
    // the exact pass must join the gram stream against the tiny sketch
    // survivors BY BROADCAST — a shuffle there would rebuild the full-
    // vocabulary exchange the sketch exists to avoid
    val bhj = collectAll(p) { case b: BroadcastHashJoinExec => b }
    assert(bhj.size == 1, s"expected the candidate broadcast join, got ${bhj.size}")
  }

  test("rolling_beta: index join + one per-symbol window, no pair expansion") {
    val p = physical(Queries.all("rolling_beta").fn(spark, sf0001))
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty)
    val windows = collectAll(p) { case w: WindowExec => w }
    // lag window (returns) + the fused 5-aggregate beta window
    assert(windows.size <= 3, s"expected <=3 windows, got ${windows.size}")
  }

  test("dedup_incremental: index probe and verify joins are hash joins, batch never self-pairs") {
    val df = Queries.all("dedup_incremental").fn(spark, sf0001)
    val p = physical(df)
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty)
    val plan = fmt(df)
    assert(!plan.contains("BroadcastNestedLoopJoin"), "no nested-loop join anywhere")
    // the three doc-id joins (sets×2 + flag join-back) are pinned
    // shuffle-hash — AQE must not flip a corpus-sized side to broadcast
    val shj = collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    assert(shj.size >= 3, s"expected >=3 shuffle-hash joins, got ${shj.size}")
  }

  test("bigram_logprob: three Zipf split-joins — tails shuffle-hash, heads broadcast") {
    val p = physical(Queries.all("bigram_logprob").fn(spark, sf0001))
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty)
    // bigram + context + unigram lookups: each tail resolve is a hinted
    // shuffle-hash join on the compact key (sort-merge would sort the
    // exploded bigram stream three times)
    val shj = collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    assert(shj.size == 3, s"expected 3 shuffled-hash tail joins, got ${shj.size}")
    // two broadcast joins per lookup (head + head-exclusion)
    val bhj = collectAll(p) { case j: BroadcastHashJoinExec => j }
    assert(bhj.size >= 6, s"expected >=6 broadcast head joins, got ${bhj.size}")
  }

  test("split_leakage_safe: one per-row hash over the cluster map — only the output sort shuffles") {
    val df = Queries.all("split_leakage_safe").fn(spark, sf0001)
    val p = physical(df)
    val ex = dataExchanges(p)
    assert(ex.size <= 1, s"expected only the ORDER BY exchange, got ${ex.size}")
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty)
  }

  test("funnel_steps: stage chain is all hash joins/aggregates on user_id, no window, no cartesian") {
    val df = Queries.all("funnel_steps").fn(spark, sf0001)
    val p = physical(df)
    assert(collectAll(p) { case w: WindowExec => w }.isEmpty, "unexpected window")
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty)
    assert(!fmt(df).contains("BroadcastNestedLoopJoin"))
  }

  test("event_transitions: one lag window, broadcast denominator, no cartesian") {
    val df = Queries.all("event_transitions").fn(spark, sf0001)
    val p = physical(df)
    // the totals aggregate re-derives from the counts subtree, so the
    // lag window appears twice in the TREE; at execution the identical
    // exchanges dedup via ReusedExchange — pin only that no THIRD
    // window shape sneaks in
    assert(collectAll(p) { case w: WindowExec => w }.size <= 2,
      "expected only the per-user lag window (possibly duplicated subtree)")
    assert(collectAll(p) { case j: BroadcastHashJoinExec => j }.nonEmpty,
      "denominator join must broadcast the tiny totals table")
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty)
  }

  test("cohort_retention: aggregates + one user join, no window anywhere") {
    val df = Queries.all("cohort_retention").fn(spark, sf0001)
    val p = physical(df)
    assert(collectAll(p) { case w: WindowExec => w }.isEmpty, "unexpected window")
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty)
    assert(!fmt(df).contains("BroadcastNestedLoopJoin"))
  }

  test("sales_rollup: one scan through Expand into a single aggregate") {
    val df = Queries.all("sales_rollup").fn(spark, sf0001)
    val p = physical(df)
    // rollup must plan as scan → Expand → HashAggregate, not one scan
    // per grouping set
    assert(collectAll(p) { case e: org.apache.spark.sql.execution.ExpandExec => e }.nonEmpty,
      "expected Expand for grouping sets")
    val scans = collectAll(p) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.size == 1, s"expected 1 lineitem scan, got ${scans.size}")
  }

  test("span_dedup: two-phase count on the span hash, shuffle-hash join back, no window") {
    for (key <- Seq("span_dedup", "span_dedup_prod")) {
      val df = Queries.all(key).fn(spark, sf0001)
      val p = physical(df)
      // a WindowExec would mean the occurrence count regressed to
      // count-over-partition(span) — the boilerplate-span skew wall
      assert(collectAll(p) { case w: WindowExec => w }.isEmpty, s"$key: window")
      assert(collectAll(p) {
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      }.nonEmpty, s"$key: join back must be shuffle-hash on the span hash")
      assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty)
      assert(!fmt(df).contains("BroadcastNestedLoopJoin"))
    }
  }

  test("dedup_exact: rank filter pushes down as two-stage WindowGroupLimit") {
    // Catalyst's InferWindowGroupLimit turns the rn=1 keep-min filter
    // into group limits on BOTH sides of the exchange — the PARTIAL
    // stage truncates every content-hash group to its top row map-side,
    // so a hot duplicate hash ships one row per map task instead of its
    // whole group through the shuffle. Pin both stages: losing the
    // partial one silently reverts hot-hash dedup to full-group shuffles.
    val p = physical(Queries.all("dedup_exact").fn(spark, sf0001))
    val limits = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec => w.mode
    }
    assert(limits.size == 2, s"expected partial+final WindowGroupLimit, got $limits")
    assert(limits.map(_.toString).toSet == Set("Partial", "Final"),
      s"expected one Partial and one Final stage, got $limits")
  }

  test("Catalyst auto-injects the runtime bloom filter on the big-big shuffle join") {
    // the built-in twin of bloom_join: when AQE can see the whole join,
    // InjectRuntimeFilter wires the same BloomFilterAggregate /
    // might_contain pair in automatically — pin that our session shape
    // (selective creation side, shuffle join) actually triggers it, so
    // the explicit operator is reserved for cross-pipeline-boundary use
    import org.apache.spark.sql.functions.col
    // run under the naturally-split condition (tiny maxPartitionBytes →
    // Tables.fanOut self-disables): InjectRuntimeFilter pattern-matches
    // filter-over-scan on the creation side and does not walk through a
    // Repartition, so the local fan-out would mask the injection this
    // pin exists to prove for the at-scale (no-fan-out) plan shape
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.files.maxPartitionBytes", "4096")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val dim = Tables.orders(s2, sf0001)
      .filter(col("o_totalprice") > 480000.0)
      .select(col("o_orderkey"), col("o_totalprice"))
    val fact = Tables.lineitem(s2, sf0001)
      .select(col("l_orderkey"), col("l_extendedprice"))
    val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
    assert(physical(joined).toString.contains("might_contain"),
      s"runtime bloom filter not injected:\n${physical(joined)}")
  }

  test("bloom_join: fact is bloom-probed before the shuffle, and the probe prunes") {
    import org.apache.spark.sql.functions.col
    val dim = Tables.orders(spark, sf0001)
      .filter(col("o_totalprice") > 480000.0).select(col("o_orderkey"))
    val fact = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_linenumber"))
    val bloom = graft.operators.BloomJoin.keyBloom(dim, col("o_orderkey"))
    val probed = graft.operators.BloomJoin.probeFilter(fact, col("l_orderkey"), bloom)
    // no false negatives: every true join row survives the probe
    val trueKeys = dim.collect().map(_.getLong(0)).toSet
    val factRows = fact.collect().map(_.getLong(0))
    val survivors = probed.collect().map(_.getLong(0))
    assert(factRows.count(trueKeys) == survivors.count(trueKeys))
    // and the probe genuinely prunes: survivors ≪ fact (fp rate ~1%)
    assert(survivors.length < factRows.length / 2,
      s"bloom probe pruned nothing: ${survivors.length} of ${factRows.length}")
    // plan shape: the probe is a plain codegen'd filter above the scan
    // (before any exchange), and the join is the hinted shuffle-hash —
    // the big-big shape the operator states
    val df = Queries.all("bloom_join").fn(spark, sf0001)
    val p = physical(df)
    assert(p.toString.contains("might_contain"), "no bloom probe in plan")
    assert(collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }.nonEmpty, "join must be shuffle-hash (big-big shape)")
  }

  test("ann_filtered_topk: label pre-filter plans as an equi-join, never cartesian") {
    val df = Queries.all("ann_filtered_topk").fn(spark, sf0001)
    val p = physical(df)
    // the whole point of pre-filtering: scoring joins on label equality
    // (broadcast here; shuffle at scale) instead of similarity_topk's
    // intentional cross join
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty,
      "filtered ANN must not cross-join")
    assert(collectAll(p) { case b: BroadcastHashJoinExec => b }.nonEmpty,
      "label gate must plan as a hash equi-join")
    val windows = collectAll(p) { case w: WindowExec => w }
    assert(windows.size == 1, s"expected one top-k window, got ${windows.size}")
  }

  test("vocab_coverage: head-K vocab plans as TakeOrdered, not a global sort") {
    import org.apache.spark.sql.functions.{col, count, explode, lit, split}
    val df = Tables.documents(spark, sf0001)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .distinct()
      .groupBy("token").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("token")).limit(16)
    val p = physical(df)
    assert(collectAll(p) {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }.nonEmpty, s"vocab head-K must plan as TakeOrderedAndProject:\n$p")
    assert(collectAll(p) { case s: org.apache.spark.sql.execution.SortExec => s }.isEmpty,
      "no global sort for a head-K selection")
  }

  test("quality_classifier: scoring is per-row — no exchange before the output sort") {
    val df = Queries.all("quality_classifier").fn(spark, sf0001)
    val p = physical(df)
    // the model rides the plan as a broadcast coefficient vector; the
    // only shuffle the scored frame is allowed is the final ORDER BY
    val ex = dataExchanges(p)
    assert(ex.size <= 1, s"expected only the ORDER BY exchange, got ${ex.size}")
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty)
  }

  test("shuffle_shard: one hash exchange ON SHARD + the output sort — never a global position sort") {
    // the terasort contract: positions come from a per-shard local sort
    // (window hash-partitioned by shard), so the only exchanges are the
    // shard hash partition and the deterministic-output range sort — a
    // range exchange BEFORE the window would mean the plan regressed to
    // a global sort over the corpus
    Seq("shuffle_shard", "shuffle_shard_prod").foreach { name =>
      val p = physical(Queries.all(name).fn(spark, sf0001))
      val ex = dataExchanges(p)
      assert(ex.size == 2, s"$name: ${ex.size} exchanges (want 2)")
      val parts = ex.map(_.outputPartitioning.toString.toLowerCase)
      assert(parts.count(_.contains("rangepartitioning")) == 1, s"$name: $parts")
      val hash = parts.filter(_.contains("hashpartitioning"))
      assert(hash.size == 1 && hash.head.contains("shard"),
        s"$name window must hash-partition on shard: $parts")
    }
  }

  test("cdc_chunk: cut detection and chunk hashing are per-row — explode, no hash exchange") {
    val p = physical(Queries.all("cdc_chunk").fn(spark, sf0001))
    // scan → native cuts → generate (posexplode) → md5 projection; the
    // only exchange is the output ORDER BY. Any hash exchange means an
    // accidental aggregation/join slipped into what must stay a single
    // linear corpus pass.
    val ex = dataExchanges(p)
    assert(ex.size <= 1, s"${ex.size} exchanges (want ≤1)")
    ex.foreach(e => assert(
      e.outputPartitioning.toString.toLowerCase.contains("range"),
      s"cdc_chunk computation shuffles: ${e.outputPartitioning}"))
    assert(collectAll(p) {
      case g: org.apache.spark.sql.execution.GenerateExec => g
    }.nonEmpty, "chunk expansion must plan as Generate")
  }

  test("pagerank: one iteration = degree join + two-phase inflow aggregate + left join, no cartesian") {
    import org.apache.spark.sql.functions.{col, count, expr, lit, sum}
    import spark.implicits._
    // reproduce one UN-checkpointed round's plan (the key's own plan is
    // lineage-cut every round by design, so the interesting shape lives
    // inside the iteration)
    val nodes = (1L to 50L).toDF("node")
    val e = (1L to 49L).map(i => (i, i + 1)).toDF("src", "dst")
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val ranks = nodes.withColumn("rank", lit(1000L))
    val inflow = e.join(deg, "src")
      .join(ranks.withColumnRenamed("node", "src"), "src")
      .select(col("dst").as("node"), expr("rank div deg").as("contrib"))
      .groupBy("node").agg(sum(col("contrib")).as("m"))
    val next = nodes.join(inflow, Seq("node"), "left")
      .select(col("node"),
        (lit(3L) + expr("(coalesce(m, CAST(0 AS BIGINT)) * 85) div 100")).as("rank"))
    val p = physical(next)
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty)
    // the inflow sum must aggregate partially below its exchange —
    // map-side combine is what bounds the per-round shuffle to the
    // distinct dst set instead of the full edge list
    val aggs = collectAll(p) {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
    }
    assert(aggs.exists(_.aggregateExpressions.exists(
        _.mode.toString.toLowerCase.contains("partial"))),
      s"inflow aggregation must have a partial phase:\n$p")
  }

  test("scd2_pit_lookup: interval predicate rides the custkey equi-join, never a BNLJ") {
    val p = physical(Queries.all("scd2_pit_lookup").fn(spark, sf0001))
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty)
    assert(collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }.isEmpty, "the validity-interval filter must be a residual on the equi-join")
  }

  test("stream_static_join: dim side broadcast — the per-micro-batch lookup never shuffles the facts") {
    import org.apache.spark.sql.functions.col
    val facts = spark.read.parquet(s"$sf0001/events.parquet")
      .select(col("event_id"), col("user_id"), col("value"))
    val dim = spark.read.parquet(s"$sf0001/customer.parquet")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val p = physical(graft.streaming.MicroBatch.enrichStatic(facts, dim))
    assert(collectAll(p) {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }.nonEmpty, s"expected a broadcast hash join:\n$p")
    assert(collectAll(p) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.isEmpty, s"a dim lookup must not shuffle the fact side:\n$p")
  }

  test("unpivot_long: melt plans as one Expand over one scan, no join") {
    val p = physical(Queries.all("unpivot_long").fn(spark, sf0001))
    assert(collectAll(p) {
      case e: org.apache.spark.sql.execution.ExpandExec => e
    }.size == 1, "unpivot must plan as a single Expand")
    val scans = collectAll(p) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.size == 1, s"lineitem scanned ${scans.size}x (want 1)")
    assert(!fmt(Queries.all("unpivot_long").fn(spark, sf0001))
      .contains("Join"), "melt must not join")
  }

  test("anti_join_orphans: left anti probes a pre-distinct'd key set") {
    val plan = fmt(Queries.all("anti_join_orphans").fn(spark, sf0001))
    assert(plan.contains("LeftAnti"), "must plan as LEFT ANTI")
    // the quantity filter must reach the lineitem scan as a pushed filter
    // and the build side must be key-distinct BEFORE the join (an
    // aggregate between scan and join), bounding the hash set by the
    // distinct key count rather than the detail row count
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThanOrEqual(l_quantity,45"),
      s"quantity filter not pushed to scan:\n$plan")
    val p = physical(Queries.all("anti_join_orphans").fn(spark, sf0001))
    def subtreeHasAgg(sp: SparkPlan): Boolean = collectAll(sp) {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
    }.nonEmpty
    val antiBuildAggs = collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
          if j.joinType.toString == "LeftAnti" => subtreeHasAgg(j.right)
    }
    assert(antiBuildAggs.nonEmpty && antiBuildAggs.forall(identity),
      "anti-join build side must be distinct'd below the join")
  }

  test("merge_upsert: exactly one full-outer join applies the whole changelog") {
    val p = physical(Queries.all("merge_upsert").fn(spark, sf0001))
    val joins = collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.size == 1, s"expected 1 join, got ${joins.size}")
    assert(joins.head.joinType.toString == "FullOuter",
      s"merge must be FULL OUTER, got ${joins.head.joinType}")
    // latest-wins collapse must aggregate partially (map-side) on both
    // sides: at 100 TB the per-customer collapse is what shrinks the
    // shuffle to one row per key per side
    val aggs = collectAll(p) {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
    }
    assert(aggs.exists(_.aggregateExpressions.exists(
      _.mode.toString.toLowerCase.contains("partial"))),
      "latest-wins collapse must have a partial phase")
  }

  test("fuzzy_join: blocked linkage is an equi-join, distance only post-block") {
    val plan = fmt(Queries.all("fuzzy_join").fn(spark, sf0001))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "blocking must make the linkage an equi-join, never all-pairs")
    assert(plan.contains("levenshtein"),
      "distance must evaluate as the codegen'd builtin")
  }

  test("range_window: one WindowExec with a RANGE frame, one hash exchange") {
    val df = Queries.all("range_window").fn(spark, sf0001)
    val p = physical(df)
    val windows = collectAll(p) { case w: WindowExec => w }
    assert(windows.size == 1, s"expected 1 WindowExec, got ${windows.size}")
    assert(windows.head.toString.contains("RangeFrame"),
      "the 30-day frame must be RANGE, not ROWS")
    // one hash exchange for the symbol partitioning + one range exchange
    // for the presentation sort; anything more means the window re-shuffled
    val ex = dataExchanges(p)
    assert(ex.size <= 2, s"expected <=2 exchanges, got ${ex.size}")
  }

  test("star_join: all five dimension edges broadcast, date filter pushed to the fact scan") {
    val df = Queries.all("star_join").fn(spark, sf0001)
    val p = physical(df)
    val bhj = collectAll(p) { case j: BroadcastHashJoinExec => j }
    assert(bhj.size >= 4,
      s"dimension edges must broadcast (got ${bhj.size} broadcast joins)")
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty)
    val plan = fmt(df)
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"),
      s"order-date filter not pushed to the orders scan:\n$plan")
    // the final 50-group aggregate must combine map-side
    val aggs = collectAll(p) {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
    }
    assert(aggs.exists(_.aggregateExpressions.exists(
      _.mode.toString.toLowerCase.contains("partial"))),
      "revenue aggregate must have a partial phase")
  }

  test("triangle_count: equi-join wedges, partial-agg degrees, bounded crosses only") {
    val p = physical(Queries.all("triangle_count").fn(spark, sf0001))
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty,
      "no unbroadcast cartesian anywhere")
    // the only nested-loop joins are the two one-row stat crosses
    val bnlj = collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }
    assert(bnlj.size == 2, s"expected the two one-row stat crosses, got ${bnlj.size}")
    // degree count must combine map-side — it is the hub-skew absorber
    val aggs = collectAll(p) {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
    }
    assert(aggs.exists(_.aggregateExpressions.exists(
      _.mode.toString.toLowerCase.contains("partial"))),
      "degree aggregation must have a partial phase")
  }

  test("scan fan-out: single-split fixture scans repartition to cores; big scans don't") {
    // the fixture parquets are one row group each — without the fan-out,
    // every per-row decode lane runs as ONE task on any core count
    val p = physical(Tables.documentSeeds(spark, sf0001))
    val rr = collectAll(p) { case e: Exchange => e }.filter(
      _.outputPartitioning.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning])
    assert(rr.size == 1, s"expected the scan fan-out exchange, got ${rr.size}")
    assert(rr.head.outputPartitioning.numPartitions ==
      spark.sparkContext.defaultParallelism,
      "fan-out width must track cluster parallelism, not a constant")
    // a scan whose natural split count reaches the parallelism must stay
    // exchange-free — the policy self-disables where files provide splits
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.files.maxPartitionBytes", "4096")
    val p2 = physical(Tables.documentSeeds(s2, sf0001))
    assert(collectAll(p2) { case e: Exchange => e }.isEmpty,
      "fan-out must not engage when the scan already has enough splits")
  }
}
