package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined-chunking boundary positions in ONE pass over the text.
  *
  * Semantically identical to the composable form
  * `posexplode(char_shingles(s, window))` filtered on
  * `hashBucket(w, modulus) === 0` with `cut = p + 1`: a cut at 1-based char
  * position `i` whenever the first 4 md5 bytes of the `window`-char
  * substring starting there — read big-endian as an UNSIGNED 32-bit int,
  * exactly the `('0x' || substr(md5(w), 1, 8))::BIGINT` the DuckDB oracle
  * computes — are ≡ 0 mod `modulus`. The native form allocates no
  * per-window String, no hex rendering, and no `conv()` re-parse; one
  * reused MessageDigest and a char→byte offset map (built once per row, so
  * multi-byte UTF-8 windows hash the same bytes `md5(substring)` would).
  */
case class CdcCuts(child: Expression, window: Int, modulus: Int)
    extends UnaryExpression with CodegenFallback {
  require(window >= 1, s"window must be >= 1, got $window")
  require(modulus >= 1, s"modulus must be >= 1, got $modulus")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cdc_cuts requires string, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val bytes = s.getBytes
    val nChars = s.numChars()
    if (nChars < window) return new GenericArrayData(Array.empty[Any])
    // char index -> byte offset (UTF-8 continuation bytes are 10xxxxxx)
    val offs = new Array[Int](nChars + 1)
    var c = 0
    var b = 0
    while (b < bytes.length) {
      if ((bytes(b) & 0xc0) != 0x80) { offs(c) = b; c += 1 }
      b += 1
    }
    offs(nChars) = bytes.length
    val md = java.security.MessageDigest.getInstance("MD5")
    val cuts = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i <= nChars - window) {
      md.reset()
      md.update(bytes, offs(i), offs(i + window) - offs(i))
      val d = md.digest()
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      if (h % modulus == 0) cuts += (i + 1)
      i += 1
    }
    new GenericArrayData(cuts.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): CdcCuts =
    copy(child = newChild)
}

object CdcExpressions {
  /** [[CdcCuts]] as a Column: 1-based cut positions (end-of-text cut NOT
    * included — callers append it, as [[graft.functions.Dedup
    * .cdcChunkStats]] does).
    */
  def cdc_cuts(text: Column, window: Int, modulus: Int): Column =
    GraftBridge.toColumn(CdcCuts(GraftBridge.toExpression(text), window, modulus))
}
