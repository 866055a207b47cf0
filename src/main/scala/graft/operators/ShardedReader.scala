package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Shard-streamed iteration: the reference's DataFrame→training-loop
  * bridge pattern (ref: oarphpy/spark.py:1257-1380
  * spark_df_to_tf_dataset) minus the TF dependency — discover distinct
  * shard keys, then stream each shard to the driver via toLocalIterator
  * without ever materializing the whole table driver-side.
  *
  * Scale notes:
  *   - shard on a MATERIALIZED column, never spark_partition_id(): the
  *     reference documents an O(n²) recompute bug from using partition
  *     id as the shard key (ref: oarphpy/spark.py:1310-1314).
  *   - `toLocalIterator` holds at most one partition in driver memory;
  *     interleave(shards) round-robins batches across shards for
  *     shuffle-ish ordering without a shuffle.
  */
object ShardedReader {

  /** Distinct shard keys, collected (small by contract: shards are
    * coarse splits, not row ids). */
  def shardKeys(df: DataFrame, shardCol: String): Seq[Any] =
    df.select(col(shardCol)).distinct().collect().map(_.get(0)).toSeq

  /** Iterator over one shard's rows; the filter is pushed into the scan. */
  def shardIterator(df: DataFrame, shardCol: String, key: Any): Iterator[Row] =
    df.filter(col(shardCol) === lit(key)).toLocalIterator().asScala

  /** Round-robin interleave of all shards in fixed-size chunks. */
  def interleaved(
      df: DataFrame, shardCol: String, chunk: Int = 256): Iterator[Row] = {
    val keys = shardKeys(df, shardCol)
    val chunked = keys.map(k => graft.util.Misc.ichunked(
      shardIterator(df, shardCol, k), chunk))
    graft.util.Misc.roundrobin(chunked: _*).flatten
  }

  private implicit class JIter[T](it: java.util.Iterator[T]) {
    def asScala: Iterator[T] = new Iterator[T] {
      def hasNext: Boolean = it.hasNext
      def next(): T = it.next()
    }
  }
}
