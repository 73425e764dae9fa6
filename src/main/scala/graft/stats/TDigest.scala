package graft.stats

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions

import scala.collection.mutable.ArrayBuffer

/** Mergeable t-digest quantile sketch (Dunning & Ertl, "Computing extremely
  * accurate quantiles using t-digests", arXiv:1902.04023) — the sketch the
  * north star names for checkpointed validation state. Merging variant:
  * points buffer until `bufferSize`, then sort-merge into centroids bounded
  * by the scale function k1(q) = δ/(2π)·asin(2q−1).
  *
  * v1 of the engine uses Spark's built-in `percentile_approx`
  * (Greenwald-Khanna) as the stand-in (SURVEY.md §4); this Aggregator is the
  * v2 upgrade: digests MERGE associatively (partition-parallel), so
  * per-partition digests checkpointed to the metrics store combine into
  * table-level quantiles without re-reading data.
  */
final class TDigest(val compression: Double = 100.0,
                    val bufferSize: Int = 512) extends Serializable {
  private var means: Array[Double] = Array.empty   // sorted by mean
  private var weights: Array[Double] = Array.empty
  private var totalWeight: Double = 0.0
  private val buf = ArrayBuffer.empty[Double]

  def add(x: Double): Unit = {
    buf += x
    if (buf.length >= bufferSize) flush()
  }

  def merge(other: TDigest): TDigest = {
    other.flush()
    flush()
    if (other.totalWeight > 0) {
      val m = means ++ other.means
      val w = weights ++ other.weights
      totalWeight += other.totalWeight
      if (m.nonEmpty) compressInto(m, w)
    }
    this
  }

  private def flush(): Unit = {
    if (buf.isEmpty) return
    val fresh = buf.toArray
    buf.clear()
    val m = means ++ fresh
    val w = weights ++ Array.fill(fresh.length)(1.0)
    totalWeight += fresh.length
    compressInto(m, w)
  }

  /** Sort candidates by mean, greedily merge under the k1 scale bound
    * (the "merging digest" algorithm, §2.2 of the paper). */
  private def compressInto(m: Array[Double], w: Array[Double]): Unit = {
    val order = m.indices.toArray.sortBy(m)
    def kOf(q: Double): Double =
      compression / (2 * math.Pi) * math.asin(2 * math.min(math.max(q, 0.0), 1.0) - 1)
    val outM = ArrayBuffer.empty[Double]
    val outW = ArrayBuffer.empty[Double]
    var accM = m(order(0)) * w(order(0))
    var accW = w(order(0))
    var wBefore = 0.0
    var i = 1
    while (i < order.length) {
      val j = order(i)
      if (kOf((wBefore + accW + w(j)) / totalWeight) - kOf(wBefore / totalWeight) <= 1.0) {
        accM += m(j) * w(j); accW += w(j)
      } else {
        outM += accM / accW; outW += accW
        wBefore += accW
        accM = m(j) * w(j); accW = w(j)
      }
      i += 1
    }
    outM += accM / accW; outW += accW
    means = outM.toArray
    weights = outW.toArray
  }

  private[stats] def loadState(m: Array[Double], w: Array[Double]): Unit = {
    means = m; weights = w; totalWeight = w.sum
  }

  /** Interpolated quantile estimate (midpoint rule between centroids). */
  def quantile(q: Double): Double = {
    flush()
    val n = means.length
    if (n == 0) return Double.NaN
    if (n == 1) return means(0)
    val target = q * totalWeight
    val mids = new Array[Double](n)
    var cum = 0.0
    var i = 0
    while (i < n) { mids(i) = cum + weights(i) / 2; cum += weights(i); i += 1 }
    if (target <= mids(0)) return means(0)
    if (target >= mids(n - 1)) return means(n - 1)
    var k = 0
    while (mids(k + 1) < target) k += 1
    val frac = (target - mids(k)) / (mids(k + 1) - mids(k))
    means(k) + frac * (means(k + 1) - means(k))
  }

  def centroidCount: Int = { flush(); means.length }
  def size: Double = { flush(); totalWeight }

  /** Serializable centroid state (means, weights) — the checkpointed form:
    * digests rebuilt from state MERGE like live ones, so per-partition rows
    * in the metrics store combine into table-level quantiles without
    * re-reading data. */
  def state: (Array[Double], Array[Double]) = { flush(); (means.clone(), weights.clone()) }
}

object TDigest {
  /** Rebuild a digest from checkpointed state. */
  def fromState(means: Seq[Double], weights: Seq[Double],
                compression: Double = 100.0): TDigest = {
    val d = new TDigest(compression)
    d.loadState(means.toArray, weights.toArray)
    d
  }
}

/** `Aggregator` over doubles → requested quantiles. */
final class TDigestQuantiles(qs: Seq[Double], compression: Double = 100.0)
    extends Aggregator[Double, TDigest, Seq[Double]] {
  def zero: TDigest = new TDigest(compression)
  def reduce(b: TDigest, a: Double): TDigest = { b.add(a); b }
  def merge(b1: TDigest, b2: TDigest): TDigest = b1.merge(b2)
  def finish(r: TDigest): Seq[Double] = qs.map(r.quantile)
  def bufferEncoder: Encoder[TDigest] = Encoders.kryo[TDigest]
  def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}

/** Checkpointable digest state: one row per digest in the metrics store. */
final case class TDigestState(means: Seq[Double], weights: Seq[Double])

/** `Aggregator` over doubles → serializable digest state (the mergeable
  * checkpoint form the north star names for validation state). */
final class TDigestSketch(compression: Double = 100.0)
    extends Aggregator[Double, TDigest, TDigestState] {
  def zero: TDigest = new TDigest(compression)
  def reduce(b: TDigest, a: Double): TDigest = { b.add(a); b }
  def merge(b1: TDigest, b2: TDigest): TDigest = b1.merge(b2)
  def finish(r: TDigest): TDigestState = {
    val (m, w) = r.state
    TDigestState(m.toSeq, w.toSeq)
  }
  def bufferEncoder: Encoder[TDigest] = Encoders.kryo[TDigest]
  def outputEncoder: Encoder[TDigestState] = ExpressionEncoder[TDigestState]()
}

object TDigestAgg {
  /** DataFrame-friendly UDAF: `df.agg(tdigestQuantiles(0.5, 0.99)(col("x")))`.
    * Partial-aggregates map-side and merges like built-in sketches. */
  def tdigestQuantiles(qs: Double*): UserDefinedFunction =
    functions.udaf(new TDigestQuantiles(qs.toSeq), Encoders.scalaDouble)

  /** Digest-state UDAF — emits struct<means,weights> for checkpointing. */
  def tdigestSketch(compression: Double = 100.0): UserDefinedFunction =
    functions.udaf(new TDigestSketch(compression), Encoders.scalaDouble)
}
