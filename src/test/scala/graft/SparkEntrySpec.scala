package graft

class SparkEntrySpec extends SparkSpec {

  test("query registry is well-formed") {
    assert(SparkEntry.defs.nonEmpty)
    // every oracle key has a query
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry flagship runs on sf0.001 with rows > 0") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs on sf0.001 and plans no accidental cartesian") {
    // engine-wide scale guard: no registered query may plan a cartesian
    // product or broadcast nested-loop join — at 100 TB either is a
    // non-starter — except where the non-equi join is the operator's
    // documented design with one side provably tiny:
    //   q_cross_join        implicit cross join: semantics ARE a cartesian
    //   q_scalar_subquery   1-row broadcast of the scalar result
    //   q_ann_topk          brute-force baseline: broadcast of the bounded
    //                       query-vector set against the corpus scan
    //   q_dedup_embedding   exact all-pairs path, hard-capped at 100k rows
    //                       (above the cap cosinePairs demands SRP blocking)
    //   q_unigram_logprob   1-row broadcast of the corpus token total
    //                       (unigramLogProb's normalizing constant)
    //   q_ann_pq            brute-force ADC baseline: bounded query set
    //                       broadcast against the codes-only corpus scan
    //                       (the scale path is q_ann_ivfpq, whose coarse-
    //                       cell equality makes it a hash join)
    //   q_ann_pq_fast       same plan, production encoder
    //   q_ann_pq_rerank     same bounded-broadcast ADC shortlist stage;
    //                       the refinement itself is an equi hash join
    //                       on the shortlist ids
    //   q_corpus_drift      two 1-row token-total aggregates broadcast
    //                       against the vocab join (the q_unigram_logprob
    //                       normalizing-constant pattern, twice)
    //   q_decontaminate_embedding  bounded eval-set broadcast against the
    //                       corpus scan (the q_ann_topk class; bench bound
    //                       enforced in crossCosineMatches)
    val cartesianByDesign =
      Set("q_cross_join", "q_scalar_subquery", "q_ann_topk",
        "q_dedup_embedding", "q_unigram_logprob", "q_ann_pq",
        "q_ann_pq_fast", "q_ann_pq_rerank", "q_corpus_drift",
        "q_decontaminate_embedding")
    val failures = SparkEntry.queries.flatMap { case (name, fn) =>
      try {
        val df = fn(spark, "/root/testdata/sf0.001")
        val plan = df.queryExecution.executedPlan.toString
        val bad = !cartesianByDesign(name) &&
          (plan.contains("CartesianProduct") ||
            plan.contains("BroadcastNestedLoopJoin"))
        df.count()
        if (bad) Some(s"$name: cartesian/nested-loop join in plan") else None
      }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
