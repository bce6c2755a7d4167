package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, Sqrt}

import graft.functions._

/** SQL-surface registration of the engine's codegen kernels — the
  * `SparkSessionExtensions` entry point the assignment calls for:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.plans.GraftExtensions ...
  *   // or on an already-built session:
  *   GraftExtensions.install(spark)
  *   spark.sql("SELECT id, vec_l2sq(embedding, query) FROM vectors")
  * }}}
  *
  * Every function lowers to the SAME Catalyst `Expression` the Column
  * API uses (doGenCode primitive loops — whole-stage codegen, no UDF
  * boxing), so `spark.sql` users get identical plans and performance to
  * the DataFrame surface. Parameterized kernels (shingle width, hash
  * count, …) take foldable integer literals, checked at analysis time.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.registry.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => VecRangeStrengthReduction)
  }
}

object GraftExtensions {

  /** Register every kernel on an existing session (same builders the
    * `spark.sql.extensions` path injects at session build time), and
    * the optimizer rules via the experimental-methods hook (the only
    * post-build extension point for optimizations).
    */
  def install(spark: SparkSession): Unit = {
    registry.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(VecRangeStrengthReduction))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ VecRangeStrengthReduction
  }

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, _)  => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def arity(args: Seq[Expression], fn: String, n: Int): Unit =
    require(args.length == n, s"$fn expects $n arguments, got ${args.length}")

  private def entry(name: String, usage: String)(
      builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = {
    // 2-arg ExpressionInfo (className, name): the richer usage-bearing
    // constructors validate `source` against a fixed set that excludes
    // libraries, so DESCRIBE FUNCTION gets the REAL expression class
    // (probed by building against no-op args) and the usage string stays
    // here as call-site documentation only.
    val clazz = (1 to 3).view.flatMap { n =>
      try Some(builder(Seq.fill(n)(Literal(1))).getClass.getName)
      catch { case _: Throwable => None }
    }.headOption.getOrElse("graft.functions")
    (FunctionIdentifier(name), new ExpressionInfo(clazz, name), builder)
  }

  /** (identifier, info, builder) triples — one per kernel. */
  val registry: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    entry("vec_dot", "vec_dot(a, b) - inner product of two float vectors") { args =>
      arity(args, "vec_dot", 2); VecDot(args(0), args(1))
    },
    entry("vec_l2sq", "vec_l2sq(a, b) - squared L2 distance") { args =>
      arity(args, "vec_l2sq", 2); VecL2Sq(args(0), args(1))
    },
    entry("vec_l2", "vec_l2(a, b) - L2 distance") { args =>
      arity(args, "vec_l2", 2); Sqrt(VecL2Sq(args(0), args(1)))
    },
    entry("vec_cosine", "vec_cosine(a, b) - cosine similarity") { args =>
      arity(args, "vec_cosine", 2); VecCosine(args(0), args(1))
    },
    entry("vec_norm", "vec_norm(a) - L2 norm") { args =>
      arity(args, "vec_norm", 1); VecNorm(args(0))
    },
    entry("tokenize_words", "tokenize_words(text) - lowercased alphanumeric word tokens") { args =>
      arity(args, "tokenize_words", 1); TokenizeWords(args(0))
    },
    entry("simhash60", "simhash60(hashes) - 60-bit SimHash over pre-hashed tokens") { args =>
      arity(args, "simhash60", 1); SimHash60(args(0))
    },
    entry("minhash_sig", "minhash_sig(hashes, k) - k-permutation MinHash signature") { args =>
      arity(args, "minhash_sig", 2)
      MinHashSig(args(0), intLit(args(1), "minhash_sig", "k"))
    },
    entry("word_shingle_hash60", "word_shingle_hash60(text, n) - tokenHash60 of every word n-shingle") { args =>
      arity(args, "word_shingle_hash60", 2)
      WordShingleHash60(args(0), intLit(args(1), "word_shingle_hash60", "n"))
    },
    entry("word_shingle_strings", "word_shingle_strings(text, n) - every word n-shingle as a string") { args =>
      arity(args, "word_shingle_strings", 2)
      WordShingleStrings(args(0), intLit(args(1), "word_shingle_strings", "n"))
    },
    entry("char_shingle_hash60", "char_shingle_hash60(text, n) - tokenHash60 of every char n-gram") { args =>
      arity(args, "char_shingle_hash60", 2)
      CharShingleHash60(args(0), intLit(args(1), "char_shingle_hash60", "n"))
    },
    entry("char_shingle_poly", "char_shingle_poly(text, n) - base-31 mod-1e9+7 polynomial hash of every char n-gram") { args =>
      arity(args, "char_shingle_poly", 2)
      CharShinglePoly(args(0), intLit(args(1), "char_shingle_poly", "n"))
    },
    entry("sorted_intersect_size", "sorted_intersect_size(a, b) - |A ∩ B| of two ascending long arrays") { args =>
      arity(args, "sorted_intersect_size", 2); SortedIntersectSize(args(0), args(1))
    },
    entry("rolling_fingerprint", "rolling_fingerprint(text) - rolling-hash document fingerprint") { args =>
      arity(args, "rolling_fingerprint", 1); RollingFingerprint(args(0))
    },
    entry("winnow_hashes", "winnow_hashes(text, k, w) - winnowing fingerprints (k-gram, window w)") { args =>
      arity(args, "winnow_hashes", 3)
      WinnowHashes(args(0), intLit(args(1), "winnow_hashes", "k"),
        intLit(args(2), "winnow_hashes", "w"))
    },
    entry("sum_str_len", "sum_str_len(arr) - total length of a string array") { args =>
      arity(args, "sum_str_len", 1); SumStrLen(args(0))
    },
    entry("interleave_bits", "interleave_bits(x, y, n) - n-bit Morton/Z-order interleave") { args =>
      arity(args, "interleave_bits", 3)
      InterleaveBits(args(0), args(1), intLit(args(2), "interleave_bits", "n"))
    },
    entry("sign_bits", "sign_bits(vec, offset, width) - packed sign-bit word of vec[offset, offset+width)") { args =>
      arity(args, "sign_bits", 3)
      SignBits(args(0), intLit(args(1), "sign_bits", "offset"),
        intLit(args(2), "sign_bits", "width"))
    }
  )
}
