package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextFuzzy

/** Pins the SymSpell blocking's losslessness on hand-computed cases the
  * corpus may not contain: distance-1 (pure delete), distance-2 with no
  * shared non-empty delete (two substitutions meeting only at the
  * empty-string key), and a just-outside-radius pair that must NOT
  * appear even though it shares delete keys.
  */
class TextFuzzySpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def pairs(words: (String, Long)*): Set[(String, String, Int)] = {
    import spark.implicits._
    TextFuzzy.fuzzyPairsCore(words.toDF("word", "freq"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
  }

  test("finds delete, substitute, and cross-length pairs; respects the radius") {
    val got = pairs("car" -> 1L, "cart" -> 2L, "cat" -> 3L, "dog" -> 4L, "carted" -> 5L)
    assert(got === Set(
      ("car", "cart", 1), // one insert
      ("car", "cat", 1), // one substitute
      ("cart", "cat", 1), // one delete
      ("cart", "carted", 2) // two inserts; carted-vs-car is dist 3 and out
    ))
  }

  test("two substitutions with disjoint letters meet at the empty-delete key") {
    // lev(ab, cd) = 2 but no non-empty string is a delete of both —
    // losslessness here depends on indexing the full ≤2 neighborhood
    // including "", the easiest key for an 'optimization' to drop.
    assert(pairs("ab" -> 1L, "cd" -> 1L) === Set(("ab", "cd", 2)))
  }

  test("pair order is lexicographic and self-pairs never emit") {
    val got = pairs("aa" -> 1L, "ab" -> 1L)
    assert(got === Set(("aa", "ab", 1)))
  }
}
