package graft.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.AccumulatorV2
import scala.collection.concurrent.TrieMap

/** Map-valued add-only accumulator: executor → driver counters.
  *
  * Semantics from the reference's Counter-valued accumulator + namespaced
  * kv-tally counters (ref: oarphpy/spark.py:362-453): `tally(k, v)` adds
  * to a named counter; `kvTally(tag, key, v)` namespaces a per-key
  * histogram under prefix `__graft_kv.` (the reference uses
  * `__psegs_kv.`; same convention, engine-local prefix).
  *
  * Scale notes: accumulator merge is associative/commutative and happens
  * in the driver's task-completion path — O(#distinct keys), never
  * O(rows). Keep key cardinality bounded by construction (tags, not ids).
  */
class CounterAccumulator
    extends AccumulatorV2[Map[String, Long], Map[String, Long]] {
  private val counts = TrieMap.empty[String, Long]

  override def isZero: Boolean = counts.isEmpty
  override def copy(): CounterAccumulator = {
    val c = new CounterAccumulator
    counts.foreach { case (k, v) => c.counts.put(k, v) }
    c
  }
  override def reset(): Unit = counts.clear()
  override def add(v: Map[String, Long]): Unit =
    v.foreach { case (k, n) => counts.updateWith(k) {
      case Some(cur) => Some(cur + n); case None => Some(n) } }
  override def merge(
      other: AccumulatorV2[Map[String, Long], Map[String, Long]]): Unit =
    add(other.value)
  override def value: Map[String, Long] = counts.toMap

  def tally(key: String, n: Long = 1L): Unit = add(Map(key -> n))
}

/** Named collection of counters attached to a session
  * (ref: oarphpy/spark.py:373-453 CounterCollection). Serializable so
  * closures may capture the whole collection; only the accumulator
  * ships to executors. */
class CounterCollection(@transient spark: SparkSession,
    name: String = "counters") extends Serializable {
  val acc = new CounterAccumulator
  spark.sparkContext.register(acc, name)

  val KvPrefix = "__graft_kv."

  def tally(key: String, n: Long = 1L): Unit = acc.tally(key, n)
  /** Namespaced histogram counter: one counter per (tag, key). */
  def kvTally(tag: String, key: String, n: Long = 1L): Unit =
    acc.tally(s"$KvPrefix$tag.$key", n)

  def counters: Map[String, Long] =
    acc.value.filterNot { case (k, _) => k.startsWith(KvPrefix) }
  def kvCounters(tag: String): Map[String, Long] = {
    val p = s"$KvPrefix$tag."
    acc.value.collect { case (k, v) if k.startsWith(p) =>
      k.stripPrefix(p) -> v }
  }

  override def toString: String =
    acc.value.toSeq.sortBy(_._1)
      .map { case (k, v) => f"$k%-40s $v%12d" }.mkString("\n")

  /** Periodic background progress logging while `body` runs — the
    * reference's `log_progress` contextmanager as a loan pattern (ref:
    * oarphpy/spark.py:431-453): a daemon thread logs the collection
    * every `freqSec` seconds, plus a final report at exit. */
  def logProgress[T](freqSec: Int = 10,
      log: String => Unit = s => println(s))(body: => T): T = {
    @volatile var done = false
    val t = new Thread(() => {
      while (!done) {
        try Thread.sleep(freqSec * 1000L)
        catch { case _: InterruptedException => }
        if (!done) log(s"[$name]\n" + toString)
      }
    })
    t.setDaemon(true)
    t.start()
    try body
    finally {
      done = true
      t.interrupt()
      t.join(2000) // a periodic line must never print after the final one
      log(s"[$name final]\n" + toString)
    }
  }
}
