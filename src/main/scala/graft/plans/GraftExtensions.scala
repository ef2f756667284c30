package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{FloatVecDot, IntVecDotExpr, JaccardSortedLongs, MinHashSigExpr,
  QuantizeInt8Expr, ShingleHashesExpr, SimHashExpr, TokenHashesExpr}

/** SQL surface for the engine's native expressions.
  *
  * Two registration paths:
  *  - [[GraftExtensions]] for `spark.sql.extensions=graft.plans.GraftExtensions`
  *    (cluster-wide, survives session cloning), the standard
  *    `SparkSessionExtensions` injection point;
  *  - [[GraftFunctions.register]] for an already-built session (tests,
  *    notebooks).
  *
  * After registration the custom kernels are usable from pure SQL:
  * {{{
  *   SELECT vec_dot(a.embedding, b.embedding) FROM ...
  *   SELECT jaccard_sorted(shingle_hashes(a.text, 3), shingle_hashes(b.text, 3)) ...
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.specs.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    GraftSql.tableFunctions.foreach(e.injectTableFunction(_))
  }
}

object GraftFunctions {
  type Builder = Seq[Expression] => Expression

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf")

  // (name, arity, usage, raw builder) — the arity check is applied to
  // EVERY function at wrap time (r12 review: the r10 named-arity fix
  // landed only on shingle_hashes, leaving the other eight to throw an
  // opaque IndexOutOfBoundsException on a missing argument; a shared
  // check in the spec table closes the class, not the symptom).
  private val rawSpecs: Seq[(String, Int, String, Builder)] = Seq(
    ("vec_dot", 2,
      "vec_dot(a, b) - double-precision dot product of two float arrays",
      (es: Seq[Expression]) => FloatVecDot(es(0), es(1))),
    ("jaccard_sorted", 2,
      "jaccard_sorted(a, b) - Jaccard similarity of two sorted bigint arrays",
      (es: Seq[Expression]) => JaccardSortedLongs(es(0), es(1))),
    ("token_hashes", 1,
      "token_hashes(text) - distinct 64-bit hashes of whitespace tokens",
      (es: Seq[Expression]) => TokenHashesExpr(es(0))),
    ("shingle_hashes", 2,
      "shingle_hashes(text, w) - sorted distinct hashes of word w-shingles",
      (es: Seq[Expression]) => {
        // named analysis-time errors instead of opaque eval/cast
        // exceptions (r10 review: a column w threw
        // UnsupportedOperationException, a BIGINT literal a CCE)
        require(es(1).foldable, "shingle_hashes: w must be an integer literal")
        val w = es(1).eval() match {
          case n: Number => n.intValue()
          case other => throw new IllegalArgumentException(
            s"shingle_hashes: w must be an integer literal, got $other")
        }
        ShingleHashesExpr(es(0), w)
      }),
    ("minhash_sig", 1,
      "minhash_sig(shingle_hashes) - 64-element MinHash signature (engine hash family)",
      (es: Seq[Expression]) => MinHashSigExpr(es(0),
        graft.operators.Dedup.as, graft.operators.Dedup.bs, graft.operators.Dedup.P)),
    ("simhash_sig", 1,
      "simhash_sig(token_hashes) - 64-bit SimHash signature",
      (es: Seq[Expression]) => SimHashExpr(es(0))),
    ("quantize_int8", 1,
      "quantize_int8(vec) - symmetric int8 scalar quantization of a float array",
      (es: Seq[Expression]) => QuantizeInt8Expr(es(0))),
    ("int_vec_dot", 2,
      "int_vec_dot(a, b) - exact integer dot of two int arrays",
      (es: Seq[Expression]) => IntVecDotExpr(es(0), es(1))),
    ("vec_dot_fd", 2,
      "vec_dot_fd(a, b) - dot of a float array against a double array (k-means centroids)",
      (es: Seq[Expression]) => graft.functions.FloatDoubleVecDot(es(0), es(1))))

  val specs: Seq[(String, ExpressionInfo, Builder)] =
    rawSpecs.map { case (name, arity, usage, raw) =>
      (name, info(name, usage), (es: Seq[Expression]) => {
        require(es.length == arity,
          s"$name: expected $arity argument(s) — usage: $usage — got ${es.length}")
        raw(es)
      })
    }

  /** Register on an existing session (temp functions). */
  def register(spark: SparkSession): Unit =
    specs.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
