package graft

import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Window => LWindow}

/** Global scale lint: every registered query's plan, swept for the two
  * shapes that silently stop scaling — quadratic joins (cartesian /
  * pure-theta against an unbounded side) and whole-relation windows.
  * PlanSpec asserts shapes query-by-query; this spec guards every
  * FUTURE query by construction: a new registration with a stray
  * crossJoin or unpartitioned window fails here unless it is
  * explicitly reviewed onto an allowlist. */
class PlanLintSpec extends SparkSpec {

  /** A join side this small is broadcast-trivial at any scale: 1-row
    * bounds/count aggregates, a LIMITed centroid pick, etc. */
  private val SmallSide = 64L

  /** Reviewed non-equi/cross joins:
    *  - q_cross_join — the reference's cross-join parity query;
    *  - q_ann_bruteforce — the exactness BASELINE the approximate ANN
    *    paths are measured against; its query side is a bounded
    *    broadcast by contract;
    *  - q_embed_bitsim — the 1-bit Hamming scan: same bounded
    *    broadcast-query-set cross as q_ann_bruteforce, over 8-byte
    *    packed rows;
    *  - q_ann_recall — embeds q_ann_bruteforce AND q_embed_bitsim
    *    verbatim as subplans, so it inherits those bounded broadcast
    *    crosses;
    *  - q_ivf_dedup_recall — measurement query whose truth side is the
    *    all-pairs cosine sweep at the dedup threshold; bounded QA
    *    cross by design (run on a sample at real scale), documented on
    *    DedupSim.qIvfDedupRecall;
    *  - q_events_gapfill / q_events_interpolate / q_events_autocorr /
    *    q_events_forecast — the dense grid × event-type dimension
    *    cross; the type dimension is distinct() of a low-cardinality
    *    column, small by data contract (autocorr and forecast share
    *    hourlyDense, which densifies the hourly series the same way
    *    the gapfill pair densify their 5-minute grid);
    *  - q_events_xcorr / q_events_seasonality — share hourlyDense
    *    verbatim with autocorr/forecast, so they inherit the same
    *    grid × type-dimension cross; their own small aggregates are
    *    broadcast and invisible to the lint;
    *  - q_events_hysteresis — shares hourlyDense verbatim too (the
    *    Schmitt trigger runs over the same dense hourly series), so
    *    it inherits the identical grid × type-dimension cross;
    *  - q_nb_langid — the (doc, token) test set crosses the CLASS
    *    dimension (distinct train langs × broadcast model), the same
    *    low-cardinality-by-data-contract dimension argument as the
    *    gapfill type cross; everything corpus-sized joins on
    *    (cl, tok) equality. */
  private val crossAllowed = Set(
    "q_cross_join", "q_ann_bruteforce", "q_embed_bitsim",
    "q_ann_recall", "q_ivf_dedup_recall",
    "q_events_gapfill", "q_events_interpolate", "q_events_autocorr",
    "q_events_forecast", "q_events_xcorr", "q_events_seasonality",
    "q_events_hysteresis", "q_nb_langid")

  /** Reviewed whole-relation windows:
    *  - q_win_unpartitioned — the documented driver-bounded
    *    reference-parity query;
    *  - q_events_concurrency — its only unpartitioned window is the
    *    cross-day carry prefix sum over per-DAY totals (one row per
    *    day, bounded by the data's time span, not its row count — the
    *    gapfill carry argument); the per-row running count is
    *    partitioned by day;
    *  - q_text_zipf — the global rank window runs on the vocabulary
    *    COUNT table (|V| rows by construction, never the corpus), the
    *    same bounded-input contract as q_win_unpartitioned. */
  private val unpartitionedAllowed = Set(
    "q_win_unpartitioned", "q_events_concurrency", "q_text_zipf",
    // burn-rate's 6h lookback windows the HOURLY ROLLUP, whose row
    // count is calendar-bounded (hours of retention, not data volume)
    // — the q_events_concurrency bounded-input contract
    "q_events_burnrate",
    // the survival life table has one row per DISTINCT lifetime in
    // days — calendar-bounded; its risk-set / cumulative-hazard
    // prefix sums run on that table, never the event log
    "q_events_survival")

  private def small(p: LogicalPlan): Boolean =
    p.maxRows.exists(_ <= SmallSide)

  test("the lint detectors fire on deliberately bad plans (negative control)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val big = Tables.orders(spark, sf)
    // unbounded crossJoin → condition-less Join, neither side small
    val cross = big.crossJoin(Tables.customer(spark, sf))
      .queryExecution.optimizedPlan.collect {
        case j: Join if j.condition.isEmpty && !small(j.left) && !small(j.right) => j
      }
    assert(cross.nonEmpty, "cross-join detector is blind")
    // a broadcast 1-row aggregate cross MUST stay invisible to it
    val tiny = big.crossJoin(
      org.apache.spark.sql.functions.broadcast(big.agg(count(lit(1)).as("n"))))
      .queryExecution.optimizedPlan.collect {
        case j: Join if j.condition.isEmpty && !small(j.left) && !small(j.right) => j
      }
    assert(tiny.isEmpty, "1-row broadcast cross falsely flagged")
    // whole-relation window → partitionSpec-less Window, unbounded child
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("o_orderkey"))
    val unpart = big.withColumn("rk", row_number().over(w))
      .queryExecution.optimizedPlan.collect {
        case lw: LWindow
          if lw.partitionSpec.isEmpty && !lw.child.maxRows.exists(_ <= 1000) => lw
      }
    assert(unpart.nonEmpty, "unpartitioned-window detector is blind")
  }

  test("no registered plan hides a quadratic join or unpartitioned window") {
    val offences = Seq.newBuilder[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val qe = fn(spark, sf).queryExecution
      qe.optimizedPlan.foreach {
        case j: Join =>
          // a join is quadratic-shaped when it has no equality
          // component at all AND neither side is provably tiny
          val hasEquality = j.condition.exists(_.exists {
            case _: EqualTo | _: EqualNullSafe => true
            case _ => false
          })
          if (!hasEquality && !small(j.left) && !small(j.right)
              && !crossAllowed(name))
            offences += s"$name: non-equi join over unbounded sides " +
              s"(${j.joinType}, cond=${j.condition})"
        case w: LWindow =>
          // an unpartitioned window single-tasks the whole relation
          // unless something upstream already bounded it (e.g. the
          // 16-row IVF centroid pick under a LIMIT)
          if (w.partitionSpec.isEmpty && !w.child.maxRows.exists(_ <= 1000)
              && !unpartitionedAllowed(name))
            offences += s"$name: unpartitioned window over unbounded input"
        case _ =>
      }
      // CartesianProduct never survives review outside the parity query
      if (qe.executedPlan.toString.contains("CartesianProduct")
          && name != "q_cross_join")
        offences += s"$name: CartesianProduct in the physical plan"
    }
    val bad = offences.result()
    assert(bad.isEmpty, s"${bad.size} plan-lint offences:\n${bad.mkString("\n")}")
  }

  test("no registered plan ranks a window over a content-hash-derived key") {
    // Round-10 lesson (q_dedup_cdc): a sorted window partitioned by a
    // CONTENT hash serializes every instance of one content value into
    // a single sort task. Content hashes are exactly the keys dedup
    // exists to find collisions on, so the hot key is guaranteed — a
    // boilerplate chunk repeated 10⁹× across 100 TB becomes one
    // straggler sort. The keep-first/keep-best verdicts must be
    // aggregates (min/max_by with map-side partials) joined back, never
    // a rank window. This lint traces each window partition key back
    // through the plan's aliases to a hash function (md5/sha/xxhash64/
    // murmur3/crc32) and flags any SORTED window partitioned by one.
    import org.apache.spark.sql.catalyst.expressions._
    def isHash(e: Expression): Boolean = e.exists {
      case _: Md5 | _: Sha1 | _: Sha2 | _: Crc32 | _: Murmur3Hash |
           _: XxHash64 => true
      case _ => false
    }
    // hash MOD n is a bounded uniform BUCKET, not a content identity:
    // every bucket holds ~corpus/n rows by uniformity of the hash,
    // independent of content skew, so a per-bucket window is balanced
    // by construction. q_shard_assign's per-shard rank is exactly this
    // shape and is the intended design — exempt mod-of-hash lineage.
    def isBucketed(e: Expression): Boolean = e.exists {
      case _: Pmod | _: Remainder => true
      case _ => false
    }
    def hashDerived(plan: LogicalPlan): Set[ExprId] = {
      val aliases = plan.collect {
        case p => p.expressions.flatMap(_.collect { case a: Alias => a })
      }.flatten
      var derived = aliases
        .filter(a => isHash(a.child) && !isBucketed(a.child))
        .map(_.exprId).toSet
      var changed = true
      while (changed) {
        val next = derived ++ aliases.filter(a =>
          !isBucketed(a.child) && a.child.exists {
            case ar: AttributeReference => derived(ar.exprId)
            case _ => false
          }).map(_.exprId)
        changed = next.size != derived.size
        derived = next
      }
      derived
    }
    def offendingWindows(plan: LogicalPlan): Seq[LWindow] = {
      val derived = hashDerived(plan)
      plan.collect {
        case w: LWindow if w.orderSpec.nonEmpty && w.partitionSpec.exists {
          case ar: AttributeReference => derived(ar.exprId)
          case e => isHash(e)
        } => w
      }
    }
    // negative control: the round-10 q_dedup_cdc shape must trip it
    import org.apache.spark.sql.functions._
    val bad = Tables.orders(spark, sf)
      .withColumn("c_hash",
        conv(substring(md5(col("o_orderpriority")), 1, 15), 16, 10).cast("long"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("c_hash")).orderBy(col("o_orderkey"))))
    assert(offendingWindows(bad.queryExecution.optimizedPlan).nonEmpty,
      "hash-key rank-window detector is blind")
    val offences = for {
      (name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
      w <- offendingWindows(fn(spark, sf).queryExecution.optimizedPlan)
    } yield s"$name: sorted window partitioned by a content-hash key " +
      s"(${w.partitionSpec.mkString(", ")})"
    assert(offences.isEmpty,
      s"hash-key rank windows single-task hot content:\n${offences.mkString("\n")}")
  }

  test("no registered query exposes a DECIMAL output column") {
    // The correctness harness hashes decimal output columns
    // asymmetrically between the engines even when value, scale, and
    // arrow type agree — in round 9 every decimal-output query
    // hash-failed and every non-decimal one passed. The contract
    // (Agg scaladoc): accumulate exact DECIMAL internally, normalize
    // to scale 4, close to DOUBLE (exact while unscaled < 2^53) or
    // STRING (q_table_fingerprint's exact-128-bit form). Schema-only
    // analysis: nothing executes here.
    val offences = for {
      (name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
      f <- fn(spark, sf).schema.fields
      if f.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType]
    } yield s"$name: ${f.name} is ${f.dataType}"
    assert(offences.isEmpty,
      s"decimal output columns defeat the oracle hash:\n${offences.mkString("\n")}")
  }
}
