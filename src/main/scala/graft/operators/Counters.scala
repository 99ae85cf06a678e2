package graft.operators

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.AccumulatorV2

/**
 * The reference counter model (cola/core/counter.py:142-187): counters are
 * `group → item → value` with a pluggable aggregator; clients hold local
 * partials and periodically merge into a global container
 * (cola/functions/counter.py:108-178) — which is exactly Spark's
 * partial/final aggregation split, so the dataset-level mapping is direct:
 *
 *   AddAggregator        (counter.py:44-67)  → sum
 *   MergeAggregator      (counter.py:70-91)  → collect_list (sorted for determinism)
 *   UniqAggregator       (counter.py:94-126) → collect_set  (sorted for determinism)
 *   OverwriteAggregator  (counter.py:129-139)→ max_by(value, ord) (last-write-wins
 *                                              needs an explicit write order)
 *
 * Engine-internal metrics use [[CounterAccumulator]] — an AccumulatorV2
 * with the same group→item shape, merged by the driver exactly like the
 * reference's counter server merges client syncs.
 */
object Counters {

  sealed trait Kind
  case object Add extends Kind
  case object Merge extends Kind
  case object Uniq extends Kind
  case object Overwrite extends Kind

  /** Dataset-level counter aggregation: one row per (group, item). */
  def aggregate(df: DataFrame, group: Column, item: Column, value: Column,
      kind: Kind, writeOrd: Column = lit(0)): DataFrame = {
    val agg = kind match {
      case Add => sum(value).as("value")
      case Merge => sort_array(collect_list(value)).as("value")
      case Uniq => sort_array(collect_set(value)).as("value")
      case Overwrite => max_by(value, writeOrd).as("value")
    }
    df.groupBy(group.as("group"), item.as("item")).agg(agg)
  }
}

/** group→item→Long counter as an AccumulatorV2 (A1/A6: executor-side
 *  partials merged at the driver; resilient to task retries by Spark's
 *  accumulator semantics, like the reference's inc_merge). */
final class CounterAccumulator private (
    private val map: TrieMap[(String, String), Long])
    extends AccumulatorV2[((String, String), Long), Map[(String, String), Long]] {

  def this() = this(TrieMap.empty)

  def add(group: String, item: String, v: Long = 1L): Unit = add(((group, item), v))

  override def isZero: Boolean = map.isEmpty
  override def copy(): CounterAccumulator = {
    val m = TrieMap.empty[(String, String), Long]
    m ++= map
    new CounterAccumulator(m)
  }
  override def reset(): Unit = map.clear()
  override def add(v: ((String, String), Long)): Unit =
    map.updateWith(v._1) { case Some(x) => Some(x + v._2); case None => Some(v._2) }
  override def merge(other: AccumulatorV2[((String, String), Long), Map[(String, String), Long]]): Unit =
    other.value.foreach { case (k, v) => add((k, v)) }
  override def value: Map[(String, String), Long] = map.toMap
}
