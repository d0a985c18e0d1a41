package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** Registers graft's native expressions as SQL functions, so
  * `spark.sql("SELECT vec_dot_f(a, b) ...")` works alongside the Column
  * API.
  *
  * Two entry points:
  *  - config-time: `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (the standard `SparkSessionExtensions` injection path);
  *  - imperative: `GraftExtensions.registerAll(spark)` on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.definitions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
  }
}

object GraftExtensions {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal INT argument, got $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  /** (name, info, builder) triples for every SQL-exposed expression. */
  val definitions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("vec_dot_f", info("vec_dot_f", "dot product of two array<float>"),
      (args: Seq[Expression]) => VecDotF(args(0), args(1))),
    ("window_poly_hash", info("window_poly_hash", "rolling window polynomial hashes"),
      (args: Seq[Expression]) => WindowPolyHash(args(0),
        intArg(args(1), "window_poly_hash"),
        args(2) match {
          case Literal(v: Long, _) => v
          case Literal(v: Int, _)  => v.toLong
          case other => throw new IllegalArgumentException(
            s"window_poly_hash expects a literal base, got $other")
        })),
    ("minhash_signature", info("minhash_signature", "p-permutation minhash signature"),
      (args: Seq[Expression]) => MinHashSignature(args(0), intArg(args(1), "minhash_signature"))),
    ("simhash64", info("simhash64", "64-bit simhash of token hashes"),
      (args: Seq[Expression]) => SimHash64(args(0))),
    ("sorted_long_intersect_count", info("sorted_long_intersect_count",
      "intersection size of two sorted array<bigint>"),
      (args: Seq[Expression]) => SortedLongIntersectCount(args(0), args(1))),
    ("bag_instance_hashes", info("bag_instance_hashes",
      "per-occurrence instance hashes of a bag of feature hashes (weighted MinHash input)"),
      (args: Seq[Expression]) => BagInstanceHashes(args(0))),
    ("fix_mojibake", info("fix_mojibake",
      "repair UTF-8-read-as-Latin-1/cp1252 mojibake (lossless round trips only)"),
      (args: Seq[Expression]) => FixMojibake(args(0))),
    ("unicode_normalize", info("unicode_normalize", "Unicode-normalize a string (NFC/NFD/NFKC/NFKD)"),
      (args: Seq[Expression]) => UnicodeNormalize(args(0), args(1) match {
        case Literal(f, _) => f.toString
        case other => throw new IllegalArgumentException(
          s"unicode_normalize expects a literal form, got $other")
      }))
  )

  /** Register everything into an existing session's function registry. */
  def registerAll(spark: SparkSession): Unit = {
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    definitions.foreach { case (name, i, builder) =>
      registry.registerFunction(FunctionIdentifier(name), i, builder)
    }
  }
}
