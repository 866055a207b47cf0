package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.ImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.HyperLogLogPlusPlusHelper
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StructField, StructType}

/** `approx_count_distinct` whose buffer STARTS from metadata-merged
  * HLL++ register words — the boundary half of the NDV-sketch hybrid
  * ([[VtMetadataAgg]]): all-in files contribute their manifest
  * registers as the seed, only the undecided boundary files scan, and
  * the result is bit-identical to a full filtered scan because
  * register merge is an order-free IDEMPOTENT join (every partial may
  * carry the seed — max(seed∪A, seed∪B) = seed∪A∪B — so task-level
  * partials and their merge stay correct without any "merge once"
  * bookkeeping). Mirrors the engine's own `HyperLogLogPlusPlus`
  * buffer conventions exactly (same helper, same word layout) —
  * it must, the seed words were written by the same helper at commit
  * time. `defaultResult` stays None: an empty boundary slice must
  * still evaluate the seeded buffer (the metadata answer), never a
  * constant 0. */
final case class SeededHll(child: Expression, relativeSD: Double,
    seed: Seq[Long], mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends ImperativeAggregate with UnaryLike[Expression] {

  @transient private lazy val helper =
    new HyperLogLogPlusPlusHelper(relativeSD)

  require(seed.size == helper.numWords,
    s"seed carries ${seed.size} words, rsd $relativeSD needs " +
      s"${helper.numWords}")

  override def prettyName: String = "seeded_approx_count_distinct"
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  // the seed words would bloat every explain line; print their count
  override def stringArgs: Iterator[Any] =
    Iterator(child, relativeSD, s"seed<${seed.size} words>")

  override def withNewMutableAggBufferOffset(newOffset: Int)
      : ImperativeAggregate = copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int)
      : ImperativeAggregate = copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression)
      : SeededHll = copy(child = newChild)

  override val aggBufferAttributes: Seq[AttributeReference] =
    Seq.tabulate(helper.numWords) { i =>
      AttributeReference(s"SEEDED_MS[$i]", LongType)()
    }
  override val inputAggBufferAttributes: Seq[AttributeReference] =
    aggBufferAttributes.map(_.newInstance())
  override def aggBufferSchema: StructType =
    StructType(aggBufferAttributes.map(a =>
      StructField(a.name, a.dataType, a.nullable)))

  override def initialize(buffer: InternalRow): Unit = {
    var i = 0
    while (i < seed.size) {
      buffer.setLong(mutableAggBufferOffset + i, seed(i))
      i += 1
    }
  }

  override def update(buffer: InternalRow, input: InternalRow): Unit = {
    val v = child.eval(input)
    if (v != null)
      helper.update(buffer, mutableAggBufferOffset, v, child.dataType)
  }

  override def merge(buffer: InternalRow, input: InternalRow): Unit =
    helper.merge(buffer, input, mutableAggBufferOffset,
      inputAggBufferOffset)

  override def eval(buffer: InternalRow): Any =
    helper.query(buffer, mutableAggBufferOffset)
}


/** Per-group register WORDS as a value: the boundary half of the
  * GROUPED NDV hybrid. Accumulates exactly like the engine's
  * `approx_count_distinct` but evaluates to the packed big-endian
  * register words (binary) instead of the estimate, so each group's
  * boundary registers can ride a Union row and be merged with the
  * metadata side's recorded words by [[HllUnionEstimate]] above the
  * union. */
final case class HllWordsAgg(child: Expression, relativeSD: Double,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends ImperativeAggregate with UnaryLike[Expression] {

  @transient private lazy val helper =
    new HyperLogLogPlusPlusHelper(relativeSD)

  override def prettyName: String = "hll_register_words"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def withNewMutableAggBufferOffset(newOffset: Int)
      : ImperativeAggregate = copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int)
      : ImperativeAggregate = copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression)
      : HllWordsAgg = copy(child = newChild)

  override val aggBufferAttributes: Seq[AttributeReference] =
    Seq.tabulate(helper.numWords) { i =>
      AttributeReference(s"WORDS_MS[$i]", LongType)()
    }
  override val inputAggBufferAttributes: Seq[AttributeReference] =
    aggBufferAttributes.map(_.newInstance())
  override def aggBufferSchema: StructType =
    StructType(aggBufferAttributes.map(a =>
      StructField(a.name, a.dataType, a.nullable)))

  override def initialize(buffer: InternalRow): Unit = {
    var i = 0
    while (i < helper.numWords) {
      buffer.setLong(mutableAggBufferOffset + i, 0L)
      i += 1
    }
  }

  override def update(buffer: InternalRow, input: InternalRow): Unit = {
    val v = child.eval(input)
    if (v != null)
      helper.update(buffer, mutableAggBufferOffset, v, child.dataType)
  }

  override def merge(buffer: InternalRow, input: InternalRow): Unit =
    helper.merge(buffer, input, mutableAggBufferOffset,
      inputAggBufferOffset)

  override def eval(buffer: InternalRow): Any = {
    val bb = java.nio.ByteBuffer.allocate(helper.numWords * 8)
    var i = 0
    while (i < helper.numWords) {
      bb.putLong(buffer.getLong(mutableAggBufferOffset + i))
      i += 1
    }
    bb.array
  }
}

/** Merge packed register words (binary rows from [[HllWordsAgg]] and
  * the metadata side's recorded per-group words) and evaluate the
  * estimate — the outer half of the grouped NDV hybrid. A null or
  * wrong-length input declines nothing silently: it is a correctness
  * bug upstream, so it throws. */
final case class HllUnionEstimate(child: Expression, relativeSD: Double,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends ImperativeAggregate with UnaryLike[Expression] {

  @transient private lazy val helper =
    new HyperLogLogPlusPlusHelper(relativeSD)

  override def prettyName: String = "hll_union_estimate"
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def withNewMutableAggBufferOffset(newOffset: Int)
      : ImperativeAggregate = copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int)
      : ImperativeAggregate = copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression)
      : HllUnionEstimate = copy(child = newChild)

  override val aggBufferAttributes: Seq[AttributeReference] =
    Seq.tabulate(helper.numWords) { i =>
      AttributeReference(s"UNION_MS[$i]", LongType)()
    }
  override val inputAggBufferAttributes: Seq[AttributeReference] =
    aggBufferAttributes.map(_.newInstance())
  override def aggBufferSchema: StructType =
    StructType(aggBufferAttributes.map(a =>
      StructField(a.name, a.dataType, a.nullable)))

  override def initialize(buffer: InternalRow): Unit = {
    var i = 0
    while (i < helper.numWords) {
      buffer.setLong(mutableAggBufferOffset + i, 0L)
      i += 1
    }
  }

  override def update(buffer: InternalRow, input: InternalRow): Unit = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[Array[Byte]]
      require(bytes.length == helper.numWords * 8,
        s"register payload of ${bytes.length} bytes cannot be a " +
          s"${helper.numWords}-word sketch")
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val words = new Array[Any](helper.numWords)
      var i = 0
      while (i < helper.numWords) { words(i) = bb.getLong; i += 1 }
      helper.merge(buffer,
        new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(words), mutableAggBufferOffset, 0)
    }
  }

  override def merge(buffer: InternalRow, input: InternalRow): Unit =
    helper.merge(buffer, input, mutableAggBufferOffset,
      inputAggBufferOffset)

  override def eval(buffer: InternalRow): Any =
    helper.query(buffer, mutableAggBufferOffset)
}
