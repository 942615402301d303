package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed Misra-Gries heavy-hitter summary — frequent items over
  * 100 TB with O(k) state per partition and NO shuffle of the data.
  *
  * The classic streaming algorithm, run as a mergeable aggregate
  * (Agarwal et al., "Mergeable Summaries", PODS'12: MG summaries merge
  * with the SAME error bound): each partition folds its rows into ≤ k
  * counters; partial summaries combine by counter addition followed by
  * subtracting the (k+1)-th largest count from everything (the merge-
  * side decrement). Only the k-counter summaries move — the aggregate's
  * traffic is O(partitions·k), independent of row count.
  *
  * Guarantees after ANY merge tree (order-independent bounds, though
  * the exact surviving counter set can vary with partitioning):
  *   - est(x) ≤ true(x) ≤ est(x) + n/(k+1)  for every reported item;
  *   - every item with true(x) > n/(k+1) is IN the summary.
  *
  * The second bound is why the production pattern is two-pass
  * ([[exactHeavyHitters]]): the sketch nominates ≤ k candidates
  * (guaranteed superset of the true heavy hitters when k ≥ 1/s), then
  * one exact aggregation over only candidate-matching rows trims false
  * positives — deterministic output, partitioning-independent, at the
  * cost of a second scan whose shuffle carries candidates only.
  */
object MisraGries {

  /** Mutable k-counter summary (kryo-encoded aggregation buffer; lives
    * as an object between rows — serialized only at shuffle edges).
    */
  final class Summary(val k: Int) extends Serializable {
    val counters: mutable.HashMap[String, Long] = mutable.HashMap.empty
    var processed: Long = 0L

    def update(item: String): Unit = {
      processed += 1
      counters.get(item) match {
        case Some(v) => counters.update(item, v + 1)
        case None if counters.size < k => counters.update(item, 1L)
        case None =>
          // decrement-all: amortized O(1) per row — each pass retires
          // k+1 units of count, so ≤ n/(k+1) passes total
          val dead = mutable.ArrayBuffer.empty[String]
          counters.foreach { case (i, v) =>
            if (v == 1L) dead += i else counters.update(i, v - 1)
          }
          dead.foreach(counters.remove)
      }
    }

    def items(): Map[String, Long] = counters.toMap

    def merge(other: Summary): Summary = {
      other.counters.foreach { case (i, v) =>
        counters.update(i, counters.getOrElse(i, 0L) + v)
      }
      processed += other.processed
      if (counters.size > k) {
        // subtract the (k+1)-th largest count, drop the non-positive
        val vs = counters.values.toArray
        java.util.Arrays.sort(vs)
        val cut = vs(vs.length - k - 1)
        val dead = mutable.ArrayBuffer.empty[String]
        counters.foreach { case (i, v) =>
          if (v <= cut) dead += i else counters.update(i, v - cut)
        }
        dead.foreach(counters.remove)
      }
      this
    }
  }

  /** finish() payload: lower-bound counts + the fold's row count (the
    * error bound's n, so callers need no second action to get it).
    */
  final case class MgResult(items: Map[String, Long], n: Long)

  private final class MgAggregator(k: Int)
      extends Aggregator[String, Summary, MgResult] {
    def zero: Summary = new Summary(k)
    def reduce(b: Summary, item: String): Summary = { b.update(item); b }
    def merge(a: Summary, b: Summary): Summary = a.merge(b)
    def finish(b: Summary): MgResult =
      MgResult(b.items(), b.processed)
    def bufferEncoder: Encoder[Summary] = Encoders.kryo[Summary]
    def outputEncoder: Encoder[MgResult] = Encoders.product[MgResult]
  }

  /** One-pass sketch: ≤ `k` candidate items with lower-bound counts,
    * plus the total row count. `df(itemCol)` must be string-typed;
    * NULLs are skipped (SQL-aggregate convention).
    */
  def sketch(df: DataFrame, itemCol: String, k: Int): MgResult = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(itemCol).cast("string")).filter(col(itemCol).isNotNull)
      .as[String]
      .select(new MgAggregator(k).toColumn)
      .head()
  }

  /** Exact heavy hitters — every item whose frequency exceeds
    * `minShare` of the rows — via sketch-then-verify: pass 1 nominates
    * ≤ k candidates (k sized so the guarantee covers `minShare`),
    * pass 2 exact-counts ONLY candidate-matching rows (broadcast
    * semi-join; the shuffle carries candidates, not the corpus) and
    * trims the sketch's false positives. Output (`itemCol`, n) is
    * deterministic and partitioning-independent — identical to the
    * direct GROUP BY ... HAVING count > minShare·n.
    */
  def exactHeavyHitters(df: DataFrame, itemCol: String,
      minShare: Double, k: Int = 0): DataFrame = {
    require(minShare > 0 && minShare < 1,
      s"minShare must be in (0,1), got $minShare")
    val kk = if (k > 0) k else math.ceil(2.0 / minShare).toInt
    require(kk + 1 > 1.0 / minShare,
      s"k=$kk cannot guarantee candidates at minShare=$minShare — " +
        "need k+1 > 1/minShare")
    val mg = sketch(df, itemCol, kk)
    val spark = df.sparkSession
    import spark.implicits._
    val cand = mg.items.keys.toSeq.toDF(itemCol)
    val threshold = minShare * mg.n
    df.select(col(itemCol).cast("string").as(itemCol))
      .join(broadcast(cand), Seq(itemCol), "left_semi")
      .groupBy(itemCol).agg(count(lit(1)).as("n"))
      .filter(col("n") > threshold)
  }
}
