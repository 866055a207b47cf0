package graft.util

/** Mergeable throughput/latency metric — a monoid usable as an
  * accumulator payload or `Aggregator` buffer.
  *
  * Capability from the reference's throughput observer
  * (ref: oarphpy/util/thruput_observer.py:20-286): track n items, bytes,
  * wall time, and per-chunk latencies; `+` merges observers from
  * different workers ("Support reduction for use in e.g. MapReduce jobs
  * as a counter", ref: thruput_observer.py:95-101,161-171).
  *
  * Latency percentiles are kept over a bounded reservoir so the merged
  * state stays O(maxSamples) regardless of row count (the reference keeps
  * all samples; bounding is the 100 TB-safe divergence, documented).
  */
final case class ThruputObserver(
    name: String = "",
    n: Long = 0L,
    numBytes: Long = 0L,
    totalNanos: Long = 0L,
    latenciesNanos: Vector[Long] = Vector.empty,
    maxSamples: Int = 10000) {

  def observe(n: Long = 0, numBytes: Long = 0, nanos: Long = 0): ThruputObserver = {
    val lat =
      if (nanos > 0 && latenciesNanos.size < maxSamples)
        latenciesNanos :+ nanos
      else latenciesNanos
    copy(n = this.n + n, numBytes = this.numBytes + numBytes,
      totalNanos = totalNanos + nanos, latenciesNanos = lat)
  }

  /** Time a thunk, observing its latency and item count. */
  def timed[T](items: Long = 1, bytes: Long = 0)(body: => T): (T, ThruputObserver) = {
    val t0 = System.nanoTime()
    val r = body
    (r, observe(items, bytes, System.nanoTime() - t0))
  }

  def +(other: ThruputObserver): ThruputObserver = ThruputObserver(
    name = if (name.nonEmpty) name else other.name,
    n = n + other.n,
    numBytes = numBytes + other.numBytes,
    totalNanos = totalNanos + other.totalNanos,
    latenciesNanos =
      (latenciesNanos ++ other.latenciesNanos).take(math.max(maxSamples, other.maxSamples)),
    maxSamples = math.max(maxSamples, other.maxSamples))

  def totalSecs: Double = totalNanos / 1e9
  def ratePerSec: Double = if (totalSecs > 0) n / totalSecs else 0.0
  def bytesPerSec: Double = if (totalSecs > 0) numBytes / totalSecs else 0.0

  def percentileNanos(p: Double): Long = {
    if (latenciesNanos.isEmpty) 0L
    else {
      val sorted = latenciesNanos.sorted
      sorted(math.min(sorted.size - 1, (p * sorted.size).toInt))
    }
  }

  override def toString: String = {
    f"""ThruputObserver($name)
       |  n          $n%d
       |  bytes      $numBytes%d
       |  total_sec  $totalSecs%.4f
       |  rate/sec   $ratePerSec%.2f
       |  bytes/sec  $bytesPerSec%.2f
       |  p50_ms     ${percentileNanos(0.50) / 1e6}%.3f
       |  p95_ms     ${percentileNanos(0.95) / 1e6}%.3f
       |  p99_ms     ${percentileNanos(0.99) / 1e6}%.3f""".stripMargin
  }
}

object ThruputObserver {
  val zero: ThruputObserver = ThruputObserver()
  def union(os: Iterable[ThruputObserver]): ThruputObserver =
    os.foldLeft(zero)(_ + _)
}
