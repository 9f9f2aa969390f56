package graft.spark.expr

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import graft.sketch.{Hll, MinHash}

/** Typed aggregators for the mergeable sketches. Both merges are
  * associative + commutative monoids (tested in SketchAlgebraSpec), so Spark
  * plans them as partial (map-side) + final aggregation — the distributed
  * form of the reference's `MinHash::merge` / `HyperLogLog::merge`
  * (`/root/reference/src/MinHash.cpp:824-863`, `HyperLogLog.cpp:446-456`).
  */
object Aggs {
  private implicit val longArrayEnc: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()

  /** bottom-k sketch union: input = per-row sorted bottom-k arrays. */
  class MinHashMergeAgg(s: Int) extends Aggregator[Array[Long], Array[Long], Array[Long]] {
    def zero: Array[Long] = Array.emptyLongArray
    def reduce(buf: Array[Long], row: Array[Long]): Array[Long] =
      if (row == null) buf else MinHash.mergeBottomK(buf, row, s)
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = MinHash.mergeBottomK(a, b, s)
    def finish(r: Array[Long]): Array[Long] = r
    def bufferEncoder: Encoder[Array[Long]] = longArrayEnc
    def outputEncoder: Encoder[Array[Long]] = longArrayEnc
  }

  /** slot-wise unsigned-min merge of fixed-width k-perm signatures. */
  class SigMergeAgg(numPerm: Int) extends Aggregator[Array[Long], Array[Long], Array[Long]] {
    def zero: Array[Long] = Array.fill(numPerm)(-1L)
    def reduce(buf: Array[Long], row: Array[Long]): Array[Long] =
      if (row == null) buf else MinHash.mergeSig(buf, row)
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = MinHash.mergeSig(a, b)
    def finish(r: Array[Long]): Array[Long] = r
    def bufferEncoder: Encoder[Array[Long]] = longArrayEnc
    def outputEncoder: Encoder[Array[Long]] = longArrayEnc
  }

  /** HLL over pre-hashed 64-bit values → register blob. */
  class HllAgg(np: Int) extends Aggregator[java.lang.Long, Array[Byte], Array[Byte]] {
    def zero: Array[Byte] = Hll.init(np)
    def reduce(buf: Array[Byte], hash: java.lang.Long): Array[Byte] = {
      if (hash != null) Hll.add(buf, hash, np)
      buf
    }
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = Hll.mergeInto(a, b)
    def finish(r: Array[Byte]): Array[Byte] = r
    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** union of HLL register blobs (e.g. rolling up per-partition sketches). */
  class HllUnionAgg(np: Int) extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    def zero: Array[Byte] = Hll.init(np)
    def reduce(buf: Array[Byte], regs: Array[Byte]): Array[Byte] =
      if (regs == null) buf else Hll.mergeInto(buf, regs)
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = Hll.mergeInto(a, b)
    def finish(r: Array[Byte]): Array[Byte] = r
    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }
}
