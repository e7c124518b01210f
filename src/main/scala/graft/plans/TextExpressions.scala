package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass MinHash signature over a shingle array.
  *
  * Semantically identical to the composable form
  * `array_min(transform(shingles, s => md5(concat(lit(s"$i|"), s))))` for
  * i in 0 until numHashes (same seed prefixes, same md5-over-UTF8 bytes,
  * same lexicographic min — so the DuckDB oracle reproduces it verbatim),
  * but evaluated as ONE pass over the shingle array computing all N hashes,
  * instead of N interpreted higher-order-function traversals that each
  * re-derive the shingle array after projection collapse. On a document
  * corpus scan this is the difference between the signature step being free
  * vs dominating the job.
  *
  * Evaluation is a tight JVM loop (CodegenFallback: one virtual call per
  * row; the O(shingles × hashes) inner work doesn't benefit from expression
  * codegen).
  *
  * Null/empty input → array of nulls (matches array_min over empty).
  */
case class MinHashes(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"min_hashes requires array<string>, got ${other.catalogString}")
    }

  @transient private lazy val seedPrefixes: Array[Array[Byte]] =
    (0 until numHashes).map(i => s"$i|".getBytes("UTF-8")).toArray

  @transient private lazy val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val HexChars = "0123456789abcdef".toCharArray

  private def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(i * 2) = HexChars(b >>> 4)
      out(i * 2 + 1) = HexChars(b & 0x0f)
      i += 1
    }
    new String(out)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = new Array[String](numHashes)
    val md = digests.get()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val shingle = arr.getUTF8String(i).getBytes
        var h = 0
        while (h < numHashes) {
          md.reset()
          md.update(seedPrefixes(h))
          md.update(shingle)
          val hx = hex(md.digest())
          if (mins(h) == null || hx.compareTo(mins(h)) < 0) mins(h) = hx
          h += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins.map(s =>
      if (s == null) null else UTF8String.fromString(s)))
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashes =
    copy(child = newChild)
}

/** Word k-shingles over a token array in one pass.
  *
  * Semantically identical to the composable form
  * `transform(sequence(1, size(toks)-k+1), i => concat_ws(" ", slice(toks, i, k)))`
  * (with empty output when size < k), but the token-array child is evaluated
  * once per row — the higher-order-function form inlines the whole
  * tokenization subtree into the lambda body, re-running
  * regexp_replace+split once per *shingle*, i.e. O(tokens²) regex work per
  * document.
  */
case class Shingles(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingles requires array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
      i += 1
    }
    val sep = UTF8String.fromString(" ")
    val out = new Array[Any](n - k + 1)
    i = 0
    while (i <= n - k) {
      val parts = new Array[UTF8String](k)
      var j = 0
      while (j < k) { parts(j) = toks(i + j); j += 1 }
      out(i) = UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

/** SimHash over a token array: 64-bit signature whose bit b is set when the
  * sum over tokens of (+1 if bit b of xxhash64(token) is set else -1) is
  * positive (Charikar's scheme).
  *
  * Semantically identical to the composable form — 64 separate
  * `aggregate(transform(toks, xxhash64), ...)` higher-order folds — but ONE
  * pass over the token array: each token is hashed once (the HOF form hashes
  * every token 64 times, and HOF lambdas are excluded from whole-stage
  * codegen, so each fold is interpreted). Per the composable form's
  * semantics, a null token contributes the hash seed (42), and a null /
  * empty array yields null / 0L respectively.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sim_hash64 requires array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      // xxhash64(col) semantics: null hashes to the seed (42).
      val h =
        if (arr.isNullAt(i)) 42L
        else {
          val s = arr.getUTF8String(i)
          XxHash64Function.hash(s, StringType, 42L)
        }
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Engine-portable 32-bit SimHash over a token array: the per-token hash is
  * the first 8 hex chars of md5(token) read as an unsigned 32-bit integer —
  * a derivation any engine reproduces in SQL
  * (`('0x' || substr(md5(t), 1, 8))::BIGINT` in DuckDB), which puts the
  * simhash family under the differential oracle; [[SimHash64]] is the
  * xxhash64 fast path (rows-only check). One pass, each token md5'd once.
  * Null tokens contribute nothing; null array → null; empty array → 0.
  */
case class SimHash32Md5(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sim_hash32_md5 requires array<string>, got ${other.catalogString}")
    }

  @transient private lazy val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](32)
    val md = digests.get()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        md.update(arr.getUTF8String(i).getBytes)
        val d = md.digest()
        // first 8 hex chars == first 4 digest bytes, big-endian unsigned
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        var b = 0
        while (b < 32) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 32) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash32Md5 =
    copy(child = newChild)
}

/** Character k-grams of a string in one pass — the shingle unit for exact
  * n-gram Jaccard (reference dedups staged extracts by substring identity,
  * `Kafka_ArrivalToConform.sh` cleanse stage). Positional (no dedup): set
  * semantics come from the array_intersect/array_union consumers, mirroring
  * DuckDB's `list_transform(generate_series(1, length(s)-k+1), i ->
  * substr(s, i, k))` so the Jaccard queries run under the differential
  * oracle. Fewer than k chars → empty array; substring offsets are
  * character-based (UTF8String), matching both engines' `substr`.
  */
case class CharShingles(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1, s"char shingle size must be >= 1, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_shingles requires string, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numChars()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - k + 1)
    var i = 0
    while (i <= n - k) {
      out(i) = s.substringSQL(i + 1, k)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): CharShingles =
    copy(child = newChild)
}

/** Exact Jaccard similarity between two SORTED, DISTINCT string arrays by
  * linear merge — |A∩B| / (|A|+|B|-|A∩B|) with no per-pair hash sets.
  *
  * Semantically identical to
  * `size(array_intersect(a,b)) / size(array_union(a,b))` (with 0.0 when the
  * union is empty) PROVIDED both inputs are sorted and duplicate-free
  * (`array_sort(array_distinct(_))`): set-dedup then happens once per
  * document at projection time instead of twice per *pair* inside the join,
  * and the per-pair cost drops from building two hash sets to one
  * allocation-free merge scan. On a blocked all-pairs Jaccard (q54) the
  * builtin form spends the whole job in intersect/union hashing; this is
  * the difference between the verify step scaling with pairs×set-size vs
  * pairs×(set-size compares).
  */
case class SortedSetJaccard(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sorted_set_jaccard requires (array<string>, array<string>), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < nx && j < ny) {
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val union = nx + ny - inter
    if (union == 0) 0.0 else inter.toDouble / union.toDouble
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedSetJaccard =
    copy(left = newLeft, right = newRight)
}

/** Intersection size of two PRE-SORTED distinct string arrays — the integer
  * half of [[SortedSetJaccard]]'s merge scan, for callers that need exact
  * integer set math downstream (e.g. q123's `(inter*20) DIV union` bucket
  * boundaries, where a double Jaccard could drift across engines). Same
  * allocation-free single merge pass; union is derivable from the input
  * sizes, so one expression covers both.
  */
case class SortedSetIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sorted_set_intersect_size requires (array<string>, array<string>), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < nx && j < ny) {
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    inter
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedSetIntersectSize =
    copy(left = newLeft, right = newRight)
}

object TextExpressions {
  /** All `numHashes` seeded-md5 MinHash values in one pass; element i equals
    * `array_min(transform(shingles, s => md5(concat(lit(s"$i|"), s))))`.
    */
  def min_hashes(shingles: Column, numHashes: Int): Column =
    GraftBridge.toColumn(MinHashes(GraftBridge.toExpression(shingles), numHashes))

  /** Word k-shingles of a token array (single evaluation of the child). */
  def shingles(tokens: Column, k: Int): Column =
    GraftBridge.toColumn(Shingles(GraftBridge.toExpression(tokens), k))

  /** 64-bit SimHash of a token array in one pass (each token hashed once). */
  def sim_hash64(tokens: Column): Column =
    GraftBridge.toColumn(SimHash64(GraftBridge.toExpression(tokens)))

  /** 32-bit md5-portable SimHash (oracle-reproducible across engines). */
  def sim_hash32_md5(tokens: Column): Column =
    GraftBridge.toColumn(SimHash32Md5(GraftBridge.toExpression(tokens)))

  /** Character k-grams of a string (single pass, positional). */
  def char_shingles(text: Column, k: Int): Column =
    GraftBridge.toColumn(CharShingles(GraftBridge.toExpression(text), k))

  /** Exact Jaccard of two sorted, distinct string arrays (linear merge). */
  def sorted_set_jaccard(a: Column, b: Column): Column =
    GraftBridge.toColumn(SortedSetJaccard(
      GraftBridge.toExpression(a), GraftBridge.toExpression(b)))

  /** Intersection size of two pre-sorted distinct string arrays (exact
    * integer — union follows as |a| + |b| − inter). */
  def sorted_set_intersect_size(a: Column, b: Column): Column =
    GraftBridge.toColumn(SortedSetIntersectSize(
      GraftBridge.toExpression(a), GraftBridge.toExpression(b)))
}
