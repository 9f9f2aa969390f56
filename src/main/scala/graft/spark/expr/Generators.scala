package graft.spark.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Lazy per-bucket pair generator: given one LSH bucket's members as
  * `array<struct<id:bigint, phash:bigint>>`, emits every unordered pair
  * `(id_a < id_b)` whose pHash Hamming distance is ≤ `maxHamming`.
  *
  * This replaces the bucket self-JOIN for normal-sized buckets: the raw
  * per-bucket cross product is walked in a tight primitive loop and filtered
  * *before* any row materializes, so the downstream `distinct` shuffle only
  * ever sees surviving pairs. One wide shuffle (the groupBy that built the
  * bucket) replaces the self-join's four (size count, size join, two join
  * sides). The reference's analog is the all-vs-all double loop
  * (`/root/reference/examples/main.cpp:98-106`) — here bounded per bucket and
  * distributed across buckets.
  */
case class BucketPairsGen(child: Expression, maxHamming: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = new StructType()
    .add("id_a", LongType, nullable = false)
    .add("id_b", LongType, nullable = false)

  override def prettyName: String = "bucket_pairs"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(s: StructType, _)
          if s.length == 2 && s.forall(_.dataType == LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bucket_pairs expects array<struct<bigint,bigint>>, got $other")
    }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Iterator.empty
    val n = arr.numElements()
    if (n < 2) return Iterator.empty
    val ids = new Array[Long](n)
    val ph = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = arr.getStruct(i, 2)
      ids(i) = s.getLong(0)
      ph(i) = s.getLong(1)
      i += 1
    }
    val h = maxHamming
    new Iterator[InternalRow] {
      private var a = 0
      private var b = 1
      private var nextRow: InternalRow = advance()
      private def advance(): InternalRow = {
        while (a < n - 1) {
          val pa = ph(a)
          while (b < n) {
            val j = b
            b += 1
            if (java.lang.Long.bitCount(pa ^ ph(j)) <= h) {
              val x = ids(a)
              val y = ids(j)
              return new GenericInternalRow(
                if (x < y) Array[Any](x, y) else Array[Any](y, x))
            }
          }
          a += 1
          b = a + 1
        }
        null
      }
      override def hasNext: Boolean = nextRow != null
      override def next(): InternalRow = { val r = nextRow; nextRow = advance(); r }
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
