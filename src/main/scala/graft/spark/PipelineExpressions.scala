package graft.spark

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Native expressions for the training-data pipeline hot paths. These compute
 * EXACTLY the values of the documented SQL-HOF forms in
 * [[graft.pipeline.TextPipeline]] (asserted by PipelineSpec's differential),
 * so the DuckDB oracles are unchanged — only the per-row cost drops.
 */

/** `minhash_sig(shingles)` ≡ `TextPipeline.minhashSigSql`: the 16-hash
  * MinHash signature, sig(i) = min over shingles of (h*(2i+3)+5i+7) % P.
  * The HOF form runs 16 interpreted `transform`+`array_min` passes and
  * allocates 16 intermediate arrays per row; this is one pass, zero
  * allocation beyond the result. */
case class MinhashSig(child: Expression)
    extends UnaryExpression with CodegenFallback {
  private final val P = graft.pipeline.TextPipeline.P
  private final val K = 16

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](K)
    if (n == 0) return new GenericArrayData(out) // nulls, like array_min([])
    val mins = Array.fill(K)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var i = 0
      while (i < K) {
        val v = (h * (2 * i + 3) + 5 * i + 7) % P
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    var i = 0
    while (i < K) { out(i) = mins(i); i += 1 }
    new GenericArrayData(out)
  }

  override def prettyName: String = "minhash_sig"
  override protected def withNewChildInternal(c: Expression): MinhashSig =
    copy(child = c)
}
