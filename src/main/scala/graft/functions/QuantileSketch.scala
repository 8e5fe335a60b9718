package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Mergeable log-bucket quantile sketch state: counts per
  * logarithmically-spaced bucket (the DDSketch bucket layout —
  * Masson, Rim, Lee, "DDSketch: a fast and fully-mergeable quantile
  * sketch with relative-error guarantees", VLDB 2019). Positive and
  * negative values get mirrored bucket maps; exact zeros their own
  * counter. Merging is bucket-count ADDITION — commutative and
  * associative — so the aggregate result is identical under ANY
  * partitioning and merge order, unlike `percentile_approx`'s
  * GK-summary merge (whose compression is merge-order dependent; the
  * one known partitioning-dependent cell in the determinism sweep
  * before this sketch existed).
  */
final class LogBucketSketch(
    val pos: mutable.HashMap[Int, Long],
    val neg: mutable.HashMap[Int, Long],
    var zero: Long) {
  def total: Long = zero + pos.valuesIterator.sum + neg.valuesIterator.sum
}

/** `log_bucket_quantile(x, alpha, q)` — deterministic approximate
  * quantile with a relative-error guarantee of `alpha` (bucket
  * boundaries at γ^k, γ = (1+α)/(1−α); any stored value is reported
  * within α·|v|). `log_bucket_median(x, alpha)` is the q = 0.5
  * special case.
  *
  * Why not `percentile_approx`: its Greenwald-Khanna summary
  * compresses as a function of merge ORDER, so the reported quantile
  * can differ between runs with different partition counts — the
  * profiler's approx path was the single documented
  * partitioning-dependent output. This sketch's state is a bucket
  * histogram whose merge is plain addition; memory is bounded by the
  * number of DISTINCT buckets (≤ ~145k over the entire double range
  * at α = 0.005, a few hundred for real columns), independent of row
  * count — the 100 TB-safe shape.
  *
  * Rank convention — Spark `Percentile`'s continuous interpolation,
  * applied to bucket estimates: position p = q·(n−1) (0-based over
  * the sorted multiset), result = est(⌊p⌋)·(1−g) + est(⌈p⌉)·g with
  * g = p − ⌊p⌋. At q = 0.5 this is the exact profiler's median
  * convention (lower middle for odd n, mean of the two middles for
  * even n). Nulls and NaNs are ignored (SQL aggregate convention);
  * all-null input yields NULL.
  */
case class LogBucketQuantileAgg(
    child: Expression,
    alpha: Double,
    q: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[LogBucketSketch] {

  require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
  require(q >= 0 && q <= 1, s"quantile must be in [0,1], got $q")
  require(child.dataType == DoubleType,
    s"log_bucket_quantile child must be DOUBLE (the registry builder " +
      s"casts), got ${child.dataType.simpleString}")

  private val gamma: Double = (1.0 + alpha) / (1.0 - alpha)
  private val logGamma: Double = math.log(gamma)

  private def bucketOf(absV: Double): Int =
    math.ceil(math.log(absV) / logGamma).toInt

  private def estimate(k: Int): Double =
    math.pow(gamma, k) * 2.0 / (gamma + 1.0)

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): LogBucketSketch =
    new LogBucketSketch(mutable.HashMap.empty, mutable.HashMap.empty, 0L)

  override def update(buf: LogBucketSketch, input: InternalRow): LogBucketSketch = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      if (!d.isNaN) {
        if (d > 0.0) buf.pos.updateWith(bucketOf(d))(c => Some(c.getOrElse(0L) + 1L))
        else if (d < 0.0) buf.neg.updateWith(bucketOf(-d))(c => Some(c.getOrElse(0L) + 1L))
        else buf.zero += 1L
      }
    }
    buf
  }

  override def merge(buf: LogBucketSketch, other: LogBucketSketch): LogBucketSketch = {
    other.pos.foreach { case (k, c) =>
      buf.pos.updateWith(k)(x => Some(x.getOrElse(0L) + c))
    }
    other.neg.foreach { case (k, c) =>
      buf.neg.updateWith(k)(x => Some(x.getOrElse(0L) + c))
    }
    buf.zero += other.zero
    buf
  }

  override def eval(buf: LogBucketSketch): Any = {
    val n = buf.total
    if (n == 0L) return null
    // ascending-value walk: negatives by DESCENDING bucket (larger
    // bucket = larger magnitude = smaller value), zeros, positives by
    // ascending bucket. Keys are sorted here, so the walk — and the
    // result — is independent of hash-map iteration order.
    val pos = q * (n - 1L).toDouble // 0-based continuous position
    val lowRank = math.floor(pos).toLong + 1L
    val highRank = math.ceil(pos).toLong + 1L
    val g = pos - math.floor(pos)
    var low = Double.NaN
    var high = Double.NaN
    var cum = 0L
    def visit(value: Double, count: Long): Unit = {
      if (count > 0L) {
        val before = cum
        cum += count
        if (before < lowRank && lowRank <= cum) low = value
        if (before < highRank && highRank <= cum) high = value
      }
    }
    buf.neg.keysIterator.toArray.sortInPlace().reverseIterator
      .foreach(k => visit(-estimate(k), buf.neg(k)))
    visit(0.0, buf.zero)
    buf.pos.keysIterator.toArray.sortInPlace()
      .foreach(k => visit(estimate(k), buf.pos(k)))
    low * (1.0 - g) + high * g
  }

  override def serialize(buf: LogBucketSketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.zero)
    out.writeInt(buf.pos.size)
    buf.pos.foreach { case (k, c) => out.writeInt(k); out.writeLong(c) }
    out.writeInt(buf.neg.size)
    buf.neg.foreach { case (k, c) => out.writeInt(k); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): LogBucketSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    buf.zero = in.readLong()
    var np = in.readInt()
    while (np > 0) { buf.pos.put(in.readInt(), in.readLong()); np -= 1 }
    var nn = in.readInt()
    while (nn > 0) { buf.neg.put(in.readInt(), in.readLong()); nn -= 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LogBucketQuantileAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LogBucketQuantileAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LogBucketQuantileAgg =
    copy(child = newChildren.head)
  override def prettyName: String =
    if (q == 0.5) "log_bucket_median" else "log_bucket_quantile"
}

object QuantileSketch {

  /** Column wrapper: deterministic approximate median (relative error
    * ≤ alpha). Resolves through the session function registry
    * ([[GraftExtensions]]), so `log_bucket_median(v, 0.005)` is
    * equally callable from passthrough SQL.
    */
  def logBucketMedian(x: Column, alpha: Double = 0.005): Column =
    org.apache.spark.sql.functions.call_function(
      "log_bucket_median", x, org.apache.spark.sql.functions.lit(alpha))

  /** Column wrapper: deterministic approximate quantile q (relative
    * error ≤ alpha) — `log_bucket_quantile(v, 0.005, 0.99)` from SQL.
    */
  def logBucketQuantile(x: Column, alpha: Double, q: Double): Column =
    org.apache.spark.sql.functions.call_function(
      "log_bucket_quantile", x, org.apache.spark.sql.functions.lit(alpha),
      org.apache.spark.sql.functions.lit(q))
}
