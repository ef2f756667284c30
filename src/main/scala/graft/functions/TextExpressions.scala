package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native tokenize-and-hash expressions for the dedup hot path.
  *
  * The higher-order-function shingle builder
  * (`transform(sequence…) → slice → concat_ws`) evaluates interpreted
  * and materializes ~N_tokens intermediate strings per document; at
  * 5000 docs that alone cost seconds, and at 100 TB it would dominate
  * the scan. These expressions do one pass over the UTF-8 bytes:
  * tokenize on ASCII whitespace, xxhash64 each token in place, combine
  * w consecutive token hashes per shingle, dedupe + sort. Per-row
  * linear work, zero string allocation.
  *
  * `CodegenFallback` is acceptable here: the per-row cost is the loop
  * itself (the expression IS the kernel), not expression dispatch.
  */
private[graft] object TokenHashing {
  /** xxhash64 of each whitespace-separated token (in byte order). */
  def tokenHashes(s: UTF8String, distinct: Boolean): Array[Long] = {
    val bytes = s.getBytes
    val out = new mutable.ArrayBuffer[Long](64)
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && isSpace(bytes(i))) i += 1
      val start = i
      while (i < n && !isSpace(bytes(i))) i += 1
      if (i > start) {
        out += org.apache.spark.unsafe.hash.Murmur3_x86_32
          .hashUnsafeBytes2(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start,
            i - start, 42).toLong & 0xffffffffL |
          (org.apache.spark.unsafe.hash.Murmur3_x86_32
            .hashUnsafeBytes2(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start,
              i - start, 4242).toLong << 32)
      }
    }
    val arr = out.toArray
    if (distinct) arr.distinct else arr
  }

  @inline private def isSpace(b: Byte): Boolean =
    // the full ASCII \s class: every regex-split consumer (`\\s+`)
    // treats \x0B (VT) and \x0C (FF) as whitespace, so the kernel must
    // too or a form-feed-bearing doc diverges between the hashed and
    // string paths (r7 review)
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == 0x0b || b == 0x0c

  /** In-order (positional, NON-distinct) w-shingle hashes — index i of
    * the result is the shingle starting at token i. The span-dedup
    * operator posexplodes this directly: zero string allocation per
    * gram (the concat_ws formulation allocates a ~50-byte string per
    * position — 2×10⁸ allocations per pass at probe 10× scale). */
  def positionalShingleHashes(s: UTF8String, w: Int): Array[Long] = {
    val toks = tokenHashes(s, distinct = false)
    if (toks.length < w) return Array.empty
    val out = new Array[Long](toks.length - w + 1)
    var i = 0
    while (i + w <= toks.length) {
      var h = -7046029254386353131L // xxhash64 prime seed
      var j = 0
      while (j < w) {
        h = (h ^ toks(i + j)) * 6364136223846793005L + 1442695040888963407L
        j += 1
      }
      out(i) = h
      i += 1
    }
    out
  }

  /** Sorted distinct hashes of w-shingles (combined token hashes). */
  def shingleHashes(s: UTF8String, w: Int): Array[Long] = {
    val dedup = positionalShingleHashes(s, w).distinct
    java.util.Arrays.sort(dedup)
    dedup
  }
}

/** Distinct token hashes of a text column (unsorted). */
case class TokenHashesExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(TokenHashing.tokenHashes(v.asInstanceOf[UTF8String], distinct = true))
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Sorted distinct w-shingle hashes of a text column. */
case class ShingleHashesExpr(child: Expression, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(w >= 1, s"shingle width must be >= 1, got $w")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(TokenHashing.shingleHashes(v.asInstanceOf[UTF8String], w))
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** In-order positional w-shingle hashes of a text column (index =
  * starting token). */
case class PositionalShingleHashesExpr(child: Expression, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(w >= 1, s"shingle width must be >= 1, got $w")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(TokenHashing.positionalShingleHashes(v.asInstanceOf[UTF8String], w))
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Aho–Corasick multi-pattern matcher over UTF-8 BYTES (Aho & Corasick
  * 1975, "Efficient string matching"): one automaton walk per document
  * finds every occurrence of every pattern simultaneously — O(bytes)
  * per row regardless of blocklist size, where the naive
  * contains-per-term scan is O(bytes × terms) and a union-of-regex
  * alternation backtracks. Byte-level matching is exact for any UTF-8
  * pattern (a multi-byte code point is just more transitions) and
  * matches substrings, the C4-badwords semantics.
  *
  * The automaton is built once per (driver or executor) from the
  * pattern set and shared; goto is a dense 256-way table per node —
  * blocklists are tiny (10²–10⁴ nodes), so dense beats per-node maps
  * on the hot path. */
private[graft] final class AhoCorasick(patterns: Array[String]) extends Serializable {
  private val pats: Array[Array[Byte]] =
    patterns.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  // trie construction
  private val goto_ = mutable.ArrayBuffer(Array.fill(256)(-1)) // node 0 = root
  private val out = mutable.ArrayBuffer(List.empty[Int])       // pattern ids ending here
  pats.zipWithIndex.foreach { case (p, id) =>
    var s = 0
    p.foreach { b =>
      val c = b & 0xff
      if (goto_(s)(c) == -1) {
        goto_ += Array.fill(256)(-1)
        out += Nil
        goto_(s)(c) = goto_.size - 1
      }
      s = goto_(s)(c)
    }
    out(s) ::= id
  }
  // BFS failure links; merge output sets along them
  private val fail = new Array[Int](goto_.size)
  locally {
    val q = mutable.Queue.empty[Int]
    (0 until 256).foreach { c =>
      val s = goto_(0)(c)
      if (s == -1) goto_(0)(c) = 0 else { fail(s) = 0; q += s }
    }
    while (q.nonEmpty) {
      val u = q.dequeue()
      (0 until 256).foreach { c =>
        val v = goto_(u)(c)
        if (v == -1) goto_(u)(c) = goto_(fail(u))(c)
        else {
          fail(v) = goto_(fail(u))(c)
          out(v) = out(v) ++ out(fail(v))
          q += v
        }
      }
    }
  }
  private val gotoFlat = goto_.toArray
  private val outFlat = out.map(_.toArray).toArray

  /** Distinct matched pattern IDS (ascending) in one byte walk. The
    * accumulator is a `ceil(n/64)`-word bitset, so the walk stays
    * O(bytes + matches) for ANY blocklist size (r8 verdict item 2:
    * the former single-`Long` bitmask capped the expression at 64
    * terms, making a 10⁴-term list cost 157 shard walks). */
  def matchIds(bytes: Array[Byte]): Array[Int] = {
    var s = 0
    val hits = new Array[Long]((pats.length + 63) >> 6)
    var i = 0
    while (i < bytes.length) {
      s = gotoFlat(s)(bytes(i) & 0xff)
      val o = outFlat(s)
      var j = 0
      while (j < o.length) { val id = o(j); hits(id >> 6) |= 1L << (id & 63); j += 1 }
      i += 1
    }
    val res = mutable.ArrayBuffer.empty[Int]
    var id = 0
    while (id < pats.length) {
      if ((hits(id >> 6) & (1L << (id & 63))) != 0) res += id
      id += 1
    }
    res.toArray
  }
}

/** Distinct blocklist terms occurring in a text column, as a sorted
  * ARRAY<STRING> — terms are matched as UTF-8 byte substrings via one
  * Aho–Corasick walk over a single automaton, any blocklist size
  * (bitset accumulator sized ceil(n/64) words). */
case class BlocklistMatchesExpr(child: Expression, terms: Seq[String])
    extends UnaryExpression with CodegenFallback {
  require(terms.nonEmpty, "at least one term")
  require(terms == terms.sorted && terms.distinct == terms,
    "terms must be sorted and distinct so emitted arrays are canonical")
  // the automaton only reports matches at visited states, so the empty
  // pattern (which `contains` matches everywhere) would silently never
  // fire — reject it rather than diverge from the contains() contract
  require(terms.forall(_.nonEmpty), "blocklist terms must be non-empty")
  @transient private lazy val ac = new AhoCorasick(terms.toArray)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any = {
    val ids = ac.matchIds(v.asInstanceOf[UTF8String].getBytes)
    new GenericArrayData(ids.map(i => UTF8String.fromString(terms(i)): Any))
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextExpressions {
  def tokenHashes(c: Column): Column = ColumnShim.column(TokenHashesExpr(ColumnShim.expression(c)))
  def shingleHashes(c: Column, w: Int): Column =
    ColumnShim.column(ShingleHashesExpr(ColumnShim.expression(c), w))
  def positionalShingleHashes(c: Column, w: Int): Column =
    ColumnShim.column(PositionalShingleHashesExpr(ColumnShim.expression(c), w))
  /** Sorted distinct blocklist terms found in `c` (substring matches,
    * one Aho–Corasick byte walk). `terms` must be sorted+distinct. */
  def blocklistMatches(c: Column, terms: Seq[String]): Column =
    ColumnShim.column(BlocklistMatchesExpr(ColumnShim.expression(c), terms))
}
