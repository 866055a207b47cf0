package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Concat-and-chunk sequence packing — the standard LLM pre-training
  * layout: documents are concatenated into one token stream in a total
  * `orderCols` order and the stream is cut into fixed `chunkTokens`
  * blocks (documents MAY span a block boundary; no padding, no
  * fragmentation loss — unlike greedy bin packing, the layout is a pure
  * function of the order, which is what makes it reproducible across
  * engines and runs).
  *
  * Emits, per document:
  *   - `start_token`: the doc's offset in the global token stream
  *   - `pack_first` / `pack_last`: the first/last chunk ids the doc's
  *     tokens land in (equal unless the doc spans a boundary;
  *     zero-token docs sit "between" streams at their start position)
  *
  * Scale shape: the only global computation is the exact prefix sum,
  * delegated to [[GlobalRank.withRunningSum]] (range partition +
  * parallel per-partition window + O(#partitions) offset broadcast) —
  * never an unpartitioned window. Everything downstream is per-row
  * arithmetic inside whole-stage codegen.
  */
object TokenPacker {

  def apply(
      df: DataFrame,
      nTokensCol: String,
      chunkTokens: Long,
      orderCols: Seq[Column]): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    val cum = GlobalRank.withRunningSum(
      df, "__cum", col(nTokensCol), orderCols)
    val n = col(nTokensCol).cast("long")
    val start = col("__cum") - n
    cum
      .withColumn("start_token", start)
      // Integral div: `div` truncates toward zero — equal to floor here
      // because token offsets are non-negative.
      .withColumn("pack_first",
        expr(s"start_token div ${chunkTokens}L"))
      .withColumn("pack_last",
        when(n > 0, expr(s"(__cum - 1L) div ${chunkTokens}L"))
          .otherwise(col("pack_first")))
      .drop("__cum")
  }
}
