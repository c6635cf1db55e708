package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape tripwire over the ENTIRE query surface: no query may plan a
  * CartesianProduct, and BroadcastNestedLoopJoin is allowed only where a
  * tiny side is broadcast BY DESIGN (allowlisted with its justification).
  * These two operators are the canonical 100 TB scale-killers — a refactor
  * that silently turns an equi-join into a nested loop passes row-equality
  * tests at sf0.001 and dies on a cluster; this spec fails it immediately.
  *
  * Queries that execute eagerly inside their builder (streaming runs,
  * EtlGroup DAGs, catalog round-trips) return an already-materialized
  * result whose plan is a trivial scan — they pass vacuously here and are
  * audited by their own specs instead.
  */
class PlanGuardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // BNL by design: a provably-small broadcast side (query batches, probe
  // tables), where the nested loop IS the intended plan
  private val bnlAllowed = Set(
    "q_ann_topk",       // brute-force baseline: query batch (10 rows) broadcast
    "q_ann_lsh",        // bucket-join probe side derived from the query batch
    "q_ann_multiprobe", // same, plus 1-bit-flip probe expansion
    "q_ann_ivf",        // IVF probe: queries x nLists seed table
    "q_ann_ivf_multiprobe",
    "q_ann_ivf_kmeans",
    "q_ann_pq",         // ADC scan: query batch (with its LUT) broadcast over codes
    "q_ann_pq_trained", // same ADC scan, Lloyd-trained codebook
    "q_ann_pq_rerank",  // same scan, plus exact re-rank of the short-list
    "q_ann_ivfpq",      // IVF probe cross (queries x nLists seeds); ADC itself equi-joins on list_id
    "q_er_gazetteer"    // gazetteer term list broadcast against features
  )

  test("no cartesian products; nested-loop joins only where allowlisted") {
    val sf = "/root/testdata/sf0.001"
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan =
        try fn(spark, sf).queryExecution.executedPlan.toString
        catch { case e: Throwable => fail(s"$name failed to plan: ${e.getMessage}") }
      if (plan.contains("CartesianProduct"))
        offenders += s"$name: CartesianProduct"
      if (plan.contains("BroadcastNestedLoopJoin") && !bnlAllowed(name))
        offenders += s"$name: BroadcastNestedLoopJoin (not allowlisted)"
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
