package graft

import org.apache.spark.sql.functions._
import graft.api.Rel

/** Property check of the multiset set-op semantics against counter
  * arithmetic — the same invariants the reference's property tests
  * assert (stupidb implements INTERSECT ALL / EXCEPT ALL with
  * collections.Counter): per value v,
  *   intersect_all(v) = min(count_a(v), count_b(v))
  *   difference_all(v) = max(count_a(v) − count_b(v), 0)
  *   union_all(v)      = count_a(v) + count_b(v)
  * Seeded random cases keep the suite deterministic. */
class SetOpsPropertySpec extends SparkSpec {

  private def counts(rows: Seq[Int]): Map[Int, Int] =
    rows.groupBy(identity).view.mapValues(_.size).toMap

  private def dfCounts(r: Rel): Map[Int, Int] =
    r.toDF.groupBy(col("v")).agg(count(lit(1)).as("n"))
      .collect().map(x => x.getInt(0) -> x.getLong(1).toInt).toMap

  test("multiset set ops match counter semantics on seeded random cases") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (1 to 15).foreach { i =>
      val a = List.fill(rnd.nextInt(25))(rnd.nextInt(6))
      val b = List.fill(rnd.nextInt(25))(rnd.nextInt(6))
      val (ca, cb) = (counts(a), counts(b))
      val (ra, rb) = (Rel(a.toDF("v")), Rel(b.toDF("v")))

      val interAll = dfCounts(ra.intersectAll(rb))
      val diffAll = dfCounts(ra.differenceAll(rb))
      val unionAll = dfCounts(ra.unionAll(rb))

      val keys = (ca.keySet ++ cb.keySet)
      keys.foreach { v =>
        val (na, nb) = (ca.getOrElse(v, 0), cb.getOrElse(v, 0))
        assert(interAll.getOrElse(v, 0) == math.min(na, nb),
          s"case $i intersect_all($v): a=$a b=$b")
        assert(diffAll.getOrElse(v, 0) == math.max(na - nb, 0),
          s"case $i difference_all($v): a=$a b=$b")
        assert(unionAll.getOrElse(v, 0) == na + nb,
          s"case $i union_all($v): a=$a b=$b")
      }
      // distinct variants are plain set algebra
      val interD = dfCounts(ra.intersect(rb)).keySet
      val unionD = dfCounts(ra.union(rb)).keySet
      assert(interD == (ca.keySet & cb.keySet), s"case $i intersect")
      assert(unionD == (ca.keySet ++ cb.keySet), s"case $i union")
    }
  }
}
