package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.expressions.{ArrayDotProduct, ArrayL2Sq, Bloom, BloomFilterAgg, BloomMightContain, FloatDotProduct, FreqItemsAgg, LongDotProduct, LshCode, RollingHashMin, SimhashAgg}
import graft.operators.Similarity

/** Session extension wiring (`spark.sql.extensions=graft.GraftExtensions`):
  * exposes the engine's native expressions to the SQL surface, so
  * `spark.sql` users get the same codegen'd kernels the DataFrame API uses —
  *
  *   graft_dot(a, b)           — Double dot product of two FLOAT arrays
  *   graft_dotd(a, b)          — Double dot product over FLOAT/DOUBLE arrays
  *                               (element types may differ per side)
  *   graft_l2sq(a, b)          — squared L2 distance over FLOAT/DOUBLE arrays
  *   graft_idot(a, b)          — exact Long dot product of two BIGINT arrays
  *   graft_lsh_code(v[, p])    — p-plane signed-hyperplane LSH code (default
  *                               [[Similarity.lshPlanes]])
  *   graft_rolling_fp(t, w)    — min w-char rolling-hash fingerprint
  *   graft_simhash(lo, hi)     — aggregate: 64-bit SimHash from two 32-bit
  *                               hash halves
  *   graft_freq_items(t, k)    — aggregate: Misra-Gries heavy hitters with
  *                               at most k counters per buffer
  *   graft_bloom(k, n)         — aggregate: serialized bloom filter over
  *                               BIGINT keys, sized for n items (~1% FP)
  *   graft_might_contain(f, k) — probe a graft_bloom filter (no false
  *                               negatives; ~1% false positives)
  *
  * Registered through `injectFunction`, the standard extension point — no
  * analyzer/optimizer forks, and the functions resolve in any session built
  * with the extension (GraftSession sets it by default).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** Builder for the plain two-argument kernels: explicit arity match so SQL
    * users get a usable message, not a MatchError.
    */
  private def binary(name: String, ctor: (Expression, Expression) => Expression)
      : Seq[Expression] => Expression = {
    case Seq(a, b) => ctor(a, b)
    case other => throw new IllegalArgumentException(
      s"$name expects exactly 2 arguments, got ${other.length}")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // Every builder matches arity EXPLICITLY: a partial function cast to
    // total would surface a raw MatchError to SQL users on the wrong
    // argument count instead of a usable message.
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two ARRAY<FLOAT> in DOUBLE"),
      binary("graft_dot", FloatDotProduct)))

    ext.injectFunction((
      FunctionIdentifier("graft_dotd"),
      info("graft_dotd",
        "graft_dotd(a, b) - dot product of two ARRAY<FLOAT|DOUBLE> (element " +
          "types may differ per side) in DOUBLE, left-to-right fold. NULL on " +
          "mismatched lengths or any null element (HOF zip_with parity)"),
      binary("graft_dotd", ArrayDotProduct)))

    ext.injectFunction((
      FunctionIdentifier("graft_l2sq"),
      info("graft_l2sq",
        "graft_l2sq(a, b) - squared L2 distance of two ARRAY<FLOAT|DOUBLE> " +
          "in DOUBLE, left-to-right fold (the PQ-encode kernel). NULL on " +
          "mismatched lengths or any null element (HOF zip_with parity)"),
      binary("graft_l2sq", ArrayL2Sq)))

    ext.injectFunction((
      FunctionIdentifier("graft_idot"),
      info("graft_idot",
        "graft_idot(a, b) - integer dot product of two ARRAY<BIGINT>. " +
          "Multiply-add is UNCHECKED 64-bit arithmetic (silently wraps on overflow, " +
          "even in ANSI mode): intended for bounded quantized codes (|v| <= 127), " +
          "where 64 terms of 127*127 cannot approach Long range."),
      binary("graft_idot", LongDotProduct)))

    ext.injectFunction((
      FunctionIdentifier("graft_lsh_code"),
      info("graft_lsh_code",
        "graft_lsh_code(v[, planes]) - signed-hyperplane LSH code of ARRAY<FLOAT>"),
      { args: Seq[Expression] =>
        args match {
          case Seq(v) => LshCode(v, Similarity.lshPlanes, Similarity.dims)
          case Seq(v, Literal(p: Int, _)) => LshCode(v, p, Similarity.dims)
          case Seq(_, p) => throw new IllegalArgumentException(
            s"graft_lsh_code: planes must be an INTEGER literal, got ${p.sql}")
          case other => throw new IllegalArgumentException(
            s"graft_lsh_code expects 1 or 2 arguments (vector[, planes literal]), got ${other.length}")
        }
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_rolling_fp"),
      info("graft_rolling_fp",
        "graft_rolling_fp(text, window) - min rolling-hash document fingerprint"),
      { args: Seq[Expression] =>
        args match {
          case Seq(t, Literal(w: Int, _)) => RollingHashMin(t, w)
          case Seq(_, w) => throw new IllegalArgumentException(
            s"graft_rolling_fp: window must be an INTEGER literal, got ${w.sql}")
          case other => throw new IllegalArgumentException(
            s"graft_rolling_fp expects exactly 2 arguments (text, window literal), got ${other.length}")
        }
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      info("graft_simhash",
        "graft_simhash(lo, hi) - aggregate 64-bit SimHash over 32-bit hash halves"),
      binary("graft_simhash", SimhashAgg(_, _))))

    ext.injectFunction((
      FunctionIdentifier("graft_freq_items"),
      info("graft_freq_items",
        "graft_freq_items(token, capacity) - Misra-Gries heavy-hitters aggregate; " +
          "at most `capacity` counters per buffer, counts exact while distinct " +
          "cardinality stays within capacity, otherwise underestimates by <= n/(capacity+1)"),
      { args: Seq[Expression] =>
        args match {
          case Seq(t, Literal(k: Int, _)) => FreqItemsAgg(t, k)
          case Seq(_, k) => throw new IllegalArgumentException(
            s"graft_freq_items: capacity must be an INTEGER literal, got ${k.sql}")
          case other => throw new IllegalArgumentException(
            s"graft_freq_items expects exactly 2 arguments (token, capacity literal), got ${other.length}")
        }
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_bloom"),
      info("graft_bloom",
        "graft_bloom(key, expectedItems) - aggregate: serialized bloom filter over " +
          "BIGINT keys sized for `expectedItems` (~1% false positives, no false " +
          "negatives); partial buffers OR-merge, so the shuffle carries fixed-size " +
          "bitsets, never key sets"),
      { args: Seq[Expression] =>
        args match {
          case Seq(k, Literal(n: Int, _)) => BloomFilterAgg(k, Bloom.wordsFor(n.toLong))
          case Seq(k, Literal(n: Long, _)) => BloomFilterAgg(k, Bloom.wordsFor(n))
          case Seq(_, n) => throw new IllegalArgumentException(
            s"graft_bloom: expectedItems must be an integer literal, got ${n.sql}")
          case other => throw new IllegalArgumentException(
            s"graft_bloom expects exactly 2 arguments (key, expectedItems literal), got ${other.length}")
        }
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_might_contain"),
      info("graft_might_contain",
        "graft_might_contain(filter, key) - probe a graft_bloom filter: false means " +
          "definitely absent, true means present or a ~1% false positive"),
      binary("graft_might_contain", BloomMightContain)))
  }
}
