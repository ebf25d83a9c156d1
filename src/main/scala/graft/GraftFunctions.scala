package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{BitwiseAnd, BitwiseOr, Cast,
  Expression, Greatest, Least, Literal, ShiftLeft, ShiftRight}
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.functions._

/** One registration surface for every native graft expression, making
  * the whole kernel set callable from `spark.sql(...)` with literal
  * parameters:
  *
  *   graft_shingles(text, n)            -> array<string>
  *   simhash64(array<string>)           -> bigint
  *   minhash_bands(arr, numHashes, b)   -> array<bigint>
  *   vector_dot(a, b) / vector_norm(a)  -> double
  *   hyperplane_sketch(vec, planeBits)  -> int
  *   topk_double(x, k)                  -> array<double> (aggregate)
  *   zorder2(a, b, bits)                -> bigint (Morton clustering key)
  *
  * Use [[GraftFunctions.registerAll]] on a live session, or configure
  * `spark.sql.extensions=graft.GraftExtensions` so every session built
  * by the deployment gets them injected (the SparkSessionExtensions
  * path — no driver code changes needed at all).
  */
object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** (name, builder) for every SQL-callable graft function. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_shingles" -> { exprs =>
      ShinglesExpr(exprs.head, intLit(exprs(1), "shingle width"))
    },
    "simhash64" -> { exprs => SimHash64Expr(exprs.head) },
    "minhash_bands" -> { exprs =>
      MinHashBandsExpr(exprs.head, intLit(exprs(1), "numHashes"),
        intLit(exprs(2), "bands"))
    },
    "vector_dot" -> { exprs => VectorDotExpr(exprs(0), exprs(1)) },
    "vector_norm" -> { exprs => VectorNormExpr(exprs.head) },
    "hyperplane_sketch" -> { exprs =>
      HyperplaneSketchExpr(exprs.head, intLit(exprs(1), "planeBits"))
    },
    "intersect_size" -> { exprs => IntersectSizeExpr(exprs(0), exprs(1)) },
    "union_size" -> { exprs => UnionSizeExpr(exprs(0), exprs(1)) },
    "topk_double" -> { exprs =>
      // numeric literals arrive as DECIMAL from SQL — coerce explicitly
      TopKDoubleAgg(Cast(exprs.head, DoubleType), intLit(exprs(1), "k"))
    },
    "zorder2" -> { exprs =>
      // same shift/mask/or tree ZOrder.zorder2 composes from Columns,
      // built from raw Catalyst expressions for the SQL surface
      val bits = intLit(exprs(2), "bits")
      require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
      val cap = (1L << bits) - 1
      def clamp(e: Expression): Expression =
        Least(Seq(Greatest(Seq(Cast(e, LongType), Literal(0L))), Literal(cap)))
      val av = clamp(exprs(0))
      val bv = clamp(exprs(1))
      (0 until bits).map { i =>
        BitwiseOr(
          ShiftLeft(BitwiseAnd(ShiftRight(av, Literal(i)), Literal(1L)),
            Literal(2 * i + 1)),
          ShiftLeft(BitwiseAnd(ShiftRight(bv, Literal(i)), Literal(1L)),
            Literal(2 * i)))
      }.reduce(BitwiseOr(_, _))
    }
  )

  /** Register everything on a live session (idempotent). */
  def registerAll(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, b, "built-in")
    }
}

/** `spark.sql.extensions` entry point: injects every graft function
  * into sessions at build time. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => FuseSetSizes)
    // DELETE … WHERE k IN (SELECT …) → equality-delete tier (must run
    // during resolution, before the analyzer's DML rewrite)
    ext.injectResolutionRule(s => graft.sql.EqDeleteRoute(s))
    // re-attach list/map interior field ids onto PRUNED scan schemas
    // (interior-renamed tables keep nested pruning — see the rule doc)
    ext.injectColumnar(s => graft.sql.InteriorIdRestoreRule(s))
    GraftFunctions.builders.foreach { case (name, b) =>
      ext.injectFunction((
        new org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft", name),
        b))
    }
  }
}
