package graft.util

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** ThruputObserver as a SQL aggregate (SURVEY §2.11 X5: where a custom
  * SQL aggregate is wanted, use Aggregator + udaf) — aggregate observed
  * (items, bytes, nanos) rows into one mergeable observer per group.
  * The reduction is the same monoid the accumulator path uses
  * (ref: oarphpy/util/thruput_observer.py:95-101 "Support reduction for
  * use in e.g. MapReduce jobs as a counter"). */
object ThruputAggregator
    extends Aggregator[(Long, Long, Long), ThruputObserver, ThruputObserver] {

  override def zero: ThruputObserver = ThruputObserver.zero
  override def reduce(b: ThruputObserver, a: (Long, Long, Long)): ThruputObserver =
    b.observe(a._1, a._2, a._3)
  override def merge(a: ThruputObserver, b: ThruputObserver): ThruputObserver =
    a + b
  override def finish(r: ThruputObserver): ThruputObserver = r
  override def bufferEncoder: Encoder[ThruputObserver] =
    Encoders.product[ThruputObserver]
  override def outputEncoder: Encoder[ThruputObserver] =
    Encoders.product[ThruputObserver]

  /** Column form: obs(items, bytes, nanos). */
  def obs(items: Column, bytes: Column, nanos: Column): Column =
    udaf(this).apply(items, bytes, nanos)
}
