package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** MAJORITY VOTE over a LONG column — the fused form of the LPA per-round
  * pair
  *   groupBy(node, label).agg(count)  →  groupBy(node).agg(max(struct(c, −label)))
  * as ONE aggregate: the most frequent label, ties to the SMALLEST label
  * (identical to the lexicographic max over (count, −label) whenever −label
  * does not overflow — and strictly safer, since no negation is evaluated).
  * Null labels carry no vote; an all-null group returns null (callers here
  * filter nulls before voting anyway).
  *
  * WHY (guide §2.4 + §1.2): the two-aggregate dag costs two exchanges per
  * LPA round (hash(count) + the argmax, which plans as a SORT aggregate —
  * struct-max buffers are not hash-aggregable) and re-sorts corpus-sized
  * vote rows every round. Fused, one round is: co-partitioned vote join →
  * this aggregate (partial label→count maps combine map-side) → ONE
  * exchange on the destination node. GraphSpec pins the fused op against
  * the original two-aggregate dag row-for-row on the spec graph + corpus
  * pairs; the q156 oracle replays every vote.
  */
case class MajorityLabelLong(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongCountMap] with UnaryLike[Expression] {

  override def prettyName: String = "majority_label"
  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"majority_label takes a BIGINT child, got ${child.dataType}")

  override def createAggregationBuffer(): LongCountMap = new LongCountMap()

  override def update(buffer: LongCountMap, input: InternalRow): LongCountMap = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long], 1L)
    buffer
  }

  override def merge(buffer: LongCountMap, other: LongCountMap): LongCountMap = {
    buffer.mergeInto(other)
    buffer
  }

  override def eval(buffer: LongCountMap): Any = {
    if (buffer.nEntries == 0) return null
    val ks = buffer.keys
    val cs = buffer.counts
    val n = cs.length
    var bestLabel = 0L
    var bestCount = 0L
    var s = 0
    while (s < n) {
      val c = cs(s)
      if (c != 0L &&
          (c > bestCount || (c == bestCount && ks(s) < bestLabel))) {
        bestCount = c
        bestLabel = ks(s)
      }
      s += 1
    }
    bestLabel
  }

  override def serialize(buffer: LongCountMap): Array[Byte] = buffer.serialize()

  override def deserialize(storageFormat: Array[Byte]): LongCountMap =
    LongCountMap.deserialize(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): MajorityLabelLong =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MajorityLabelLong =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): MajorityLabelLong =
    copy(child = newChild)
}
