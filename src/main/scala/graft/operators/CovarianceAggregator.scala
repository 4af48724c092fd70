package graft.operators

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** One upper-triangle covariance cell, moments still EXACT integers
  * (decimal strings — the plan casts them to DECIMAL(38,0) and closes
  * the covariance formula with the same Catalyst expressions as the
  * relational form, so engine arithmetic never moves into the JVM). */
case class CovMoments(i: Int, j: Int, sij: String, si: String, sj: String,
                      n: Long)

/** Single-pass d²-buffer covariance moments — the SCALE shape for
  * covariance/PCA statistics over an embedding column.
  *
  * The relational form (explode components, self-join on vec_id,
  * partial-aggregate the d(d+1)/2 products) is correct and shuffles
  * only d² rows, but its map stage MATERIALIZES n·d(d+1)/2 join rows
  * (d=64 ⇒ ~2080× row amplification) before the partials absorb
  * them. This Aggregator streams each quantized vector ONCE through
  * one flat per-task buffer holding all d(d+1)/2 product sums plus
  * the d component sums — no join, no explode, and the shuffle
  * carries exactly |tasks| buffers.
  *
  * Exactness: inputs are the same ×2²⁴-quantized BIGINT components
  * the relational form sums as DECIMAL(38,0). Each |q| < 2²⁶, so a
  * product fits a long (< 2⁵²) and sums accumulate in 128-bit
  * (hi, lo) pairs — overflow-proof past 10²³ rows, exact and
  * order-independent, which is what keeps the result hash-identical
  * to the relational twin AND the DuckDB oracle.
  *
  * Buffer: one primitive Array[Long] of 1 + 2d + d(d+1) slots
  * (n, then (hi, lo) per component sum, then (hi, lo) per product
  * sum) — ~34 KB at d=64, serialized once per task at the partial →
  * final exchange. */
class CovarianceAggregator(d: Int)
    extends Aggregator[Seq[Long], Array[Long], Seq[CovMoments]] {
  require(d > 0, s"dimension must be positive, got $d")

  private val pairs = d * (d + 1) / 2
  // layout: [0] = n; [1 + 2i] = hi, [2 + 2i] = lo of s_i;
  // [1 + 2d + 2t] = hi, [+1] = lo of the t-th upper-triangle product
  private val pairBase = 1 + 2 * d

  override def zero: Array[Long] = new Array[Long](1 + 2 * d + 2 * pairs)

  /** 128-bit add of signed v into the (hi, lo) pair at `at`. */
  @inline private def add128(b: Array[Long], at: Int, v: Long): Unit = {
    val lo = b(at + 1)
    val newLo = lo + v
    // carry out of the unsigned low word (standard bit trick)
    val carry = ((lo & v) | ((lo | v) & ~newLo)) >>> 63
    b(at + 1) = newLo
    b(at) += (v >> 63) + carry // sign-extend v into the high word
  }

  /** Quantized components must stay below 2²⁶ so a(i)·a(j) < 2⁵² fits
    * a long — the ×2²⁴ quantization of unit-normish embeddings
    * guarantees it, but a contract violation must fail LOUDLY here
    * rather than silently overflow into a plausible-looking moment. */
  private val MaxAbsComponent = 1L << 26

  override def reduce(b: Array[Long], q: Seq[Long]): Array[Long] = {
    require(q.length == d, s"expected $d components, got ${q.length}")
    val a = q.toArray
    b(0) += 1L
    var i = 0
    var t = 0
    while (i < d) {
      require(math.abs(a(i)) < MaxAbsComponent,
        s"quantized component ${a(i)} breaches |q| < 2^26 — " +
          "product sums would overflow silently")
      add128(b, 1 + 2 * i, a(i))
      var j = i
      while (j < d) {
        add128(b, pairBase + 2 * t, a(i) * a(j))
        t += 1
        j += 1
      }
      i += 1
    }
    b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    x(0) += y(0)
    var c = 1
    while (c < x.length) {
      // add y's (hi, lo) into x's: low word with carry, then highs
      val lo = x(c + 1)
      val v = y(c + 1)
      val newLo = lo + v
      val carry = ((lo & v) | ((lo | v) & ~newLo)) >>> 63
      x(c + 1) = newLo
      x(c) += y(c) + carry
      c += 2
    }
    x
  }

  private def big(b: Array[Long], at: Int): java.math.BigInteger = {
    val hi = java.math.BigInteger.valueOf(b(at)).shiftLeft(64)
    val lo = b(at + 1)
    val loU =
      if (lo >= 0) java.math.BigInteger.valueOf(lo)
      else java.math.BigInteger.valueOf(lo)
        .add(java.math.BigInteger.ONE.shiftLeft(64))
    hi.add(loU)
  }

  override def finish(b: Array[Long]): Seq[CovMoments] = {
    val n = b(0)
    val s = (0 until d).map(i => big(b, 1 + 2 * i).toString)
    val out = Seq.newBuilder[CovMoments]
    var i = 0
    var t = 0
    while (i < d) {
      var j = i
      while (j < d) {
        // 1-based (i, j) to match the relational form's posexplode + 1
        out += CovMoments(i + 1, j + 1,
          big(b, pairBase + 2 * t).toString, s(i), s(j), n)
        t += 1
        j += 1
      }
      i += 1
    }
    out.result()
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[CovMoments]] =
    ExpressionEncoder[Seq[CovMoments]]()
}
