package graft

import org.apache.spark.sql.functions._

/** Property check of both as-of directions against the brute-force
  * definition — for each left row (k, t):
  *   backward: payload of the right row with max rt such that rt <= t
  *   forward:  payload of the right row with min rt such that rt >= t
  * on seeded random keyed/timed data with deliberate time ties and
  * keys missing from either side. The union-sort implementation must
  * match the O(|L|·|R|) definition exactly, including tie inclusion
  * and NULL when no right row qualifies. */
class AsofPropertySpec extends SparkSpec {

  test("as-of backward/forward match the brute-force definition") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (1 to 10).foreach { i =>
      // small key/time domains force collisions, ties, and empty keys
      val left = List.fill(1 + rnd.nextInt(30))(
        (rnd.nextInt(5).toLong, rnd.nextInt(20).toLong))
      // right side unique per (key, time) — the operator's contract
      val right = List.fill(1 + rnd.nextInt(30))(
        (rnd.nextInt(5).toLong, rnd.nextInt(20).toLong))
        .distinct.map { case (k, t) => (k, t, s"p$k-$t") }

      val ldf = left.toDF("k", "t")
      val rdf = right.toDF("k", "t", "p")

      def run(forward: Boolean): Map[(Long, Long), Option[String]] = {
        val out =
          if (forward) graft.operators.AsofJoin.asofForward(
            ldf, rdf, "k", "t", Seq("p"))
          else graft.operators.AsofJoin.asof(ldf, rdf, "k", "t", Seq("p"))
        out.collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> Option(r.getString(2)))
          .toMap
      }
      def brute(forward: Boolean): Map[(Long, Long), Option[String]] =
        left.distinct.map { case (k, t) =>
          val cand =
            if (forward) right.filter(r => r._1 == k && r._2 >= t)
            else right.filter(r => r._1 == k && r._2 <= t)
          val best =
            if (cand.isEmpty) None
            else if (forward) Some(cand.minBy(_._2)._3)
            else Some(cand.maxBy(_._2)._3)
          (k, t) -> best
        }.toMap

      assert(run(forward = false) == brute(forward = false),
        s"case $i backward: left=$left right=$right")
      assert(run(forward = true) == brute(forward = true),
        s"case $i forward: left=$left right=$right")
    }
  }

  test("nearest as-of matches the brute-force definition with back ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    (1 to 10).foreach { i =>
      val left = List.fill(1 + rnd.nextInt(30))(
        (rnd.nextInt(5).toLong, rnd.nextInt(20).toLong))
      val right = List.fill(1 + rnd.nextInt(30))(
        (rnd.nextInt(5).toLong, rnd.nextInt(20).toLong))
        .distinct.map { case (k, t) => (k, t, s"p$k-$t") }
      val got = graft.operators.AsofJoin.asofNearest(
          left.toDF("k", "t"), right.toDF("k", "t", "p"),
          "k", "t", Seq("p")).collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((Option(r.get(3)).map(_.asInstanceOf[Long]),
            Option(r.getString(2))))).toMap
      // brute force: min |rt - t|; equal distance -> the EARLIER row
      val want = left.distinct.map { case (k, t) =>
        val cand = right.filter(_._1 == k)
        val best =
          if (cand.isEmpty) (None, None)
          else {
            val b = cand.minBy(r => (math.abs(r._2 - t), r._2))
            (Some(b._2), Some(b._3))
          }
        (k, t) -> best
      }.toMap
      assert(got == want, s"case $i: left=$left right=$right")
    }
  }

  test("interpolation matches the closed-form line on a constructed series") {
    // hand-checkable: observations at buckets 0 and 3 of one day;
    // the two gap buckets must sit exactly on the line between them
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // reuse the production recipe shape at unit scale: window-based
    // prev/next neighbor scan over an in-memory frame
    val rows = Seq((0L, Some(10.0)), (1L, None), (2L, None), (3L, Some(40.0)),
      (4L, None)).toDF("m", "v")
    val wPrev = Window.orderBy(col("m"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.orderBy(col("m"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obs = when(col("v").isNotNull, struct(col("m"), col("v")))
    val p = max(obs).over(wPrev)
    val n = min(obs).over(wNext)
    val interp = when(col("v").isNotNull, col("v"))
      .when(p.isNotNull && n.isNotNull,
        p("v") + (n("v") - p("v")) *
          ((col("m") - p("m")).cast("double") / (n("m") - p("m")).cast("double")))
    val got = rows.select(col("m"), interp.as("iv")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
      .toMap
    assert(got == Map(0L -> Some(10.0), 1L -> Some(20.0), 2L -> Some(30.0),
      3L -> Some(40.0), 4L -> None), s"got $got")
  }
}
