package graft

/** Round-9 additions: the covariance input-contract guard and the
  * multi-probe IVF dedup recall measurement. */
class Round9OperatorsSpec extends SparkSpec {

  test("covariance aggregator rejects components breaching the 2^26 contract") {
    val agg = new graft.operators.CovarianceAggregator(2)
    val bound = 1L << 26
    // at the bound: products could overflow silently — must fail loudly
    intercept[IllegalArgumentException] {
      agg.reduce(agg.zero, Seq(bound, 0L))
    }
    intercept[IllegalArgumentException] {
      agg.reduce(agg.zero, Seq(0L, -bound))
    }
    // one below the bound is inside the contract
    agg.reduce(agg.zero, Seq(bound - 1, -(bound - 1)))
    ()
  }

  test("ivf dedup recall: one row per probe depth, multi-probe dominates") {
    val rows = graft.queries.DedupSim.qIvfDedupRecall(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // static method dimension: both rows present even if a depth
    // found nothing
    assert(rows.keySet == Set("probe1", "probe2"), s"methods: ${rows.keySet}")
    val (p1, p2) = (rows("probe1"), rows("probe2"))
    assert(p1._1 == p2._1, "both rows share one truth count")
    assert(p1._4 >= 0.0 && p1._4 <= 1.0 && p2._4 >= 0.0 && p2._4 <= 1.0)
    // probe2's pair set is a superset of probe1's (the nearest cell is
    // among the two probed), so its recall and pair count dominate
    assert(p2._4 >= p1._4, s"multi-probe lost recall: $rows")
    assert(p2._2 >= p1._2, s"multi-probe lost pairs: $rows")
  }
}
