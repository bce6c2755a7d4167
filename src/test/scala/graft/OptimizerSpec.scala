package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.functions._
import graft.plans.{GraftExtensions, VecRangeStrengthReduction}

/** The injected optimizer rule must be EXACTLY output-preserving: the
  * rewrite threshold is the largest double whose sqrt stays within the
  * radius, not the naively-rounded r·r.
  */
class OptimizerSpec extends SparkSpec {

  test("maxSqLe/maxSqLt are the exact predicate boundaries") {
    val rng = new Random(42)
    val radii = Seq(0.0, 1.0, 1.25, 2.0, math.sqrt(2.0), 1e-8, 1e8, 0.1) ++
      (1 to 200).map(_ => math.abs(rng.nextDouble()) * math.pow(10, rng.nextInt(12) - 6))
    radii.foreach { r =>
      val le = VecRangeStrengthReduction.maxSqLe(r)
      assert(math.sqrt(le) <= r, s"r=$r le=$le")
      assert(math.sqrt(math.nextUp(le)) > r, s"r=$r le=$le")
      if (r > 0) {
        val lt = VecRangeStrengthReduction.maxSqLt(r)
        assert(math.sqrt(lt) < r, s"r=$r lt=$lt")
        assert(math.sqrt(math.nextUp(lt)) >= r, s"r=$r lt=$lt")
      }
    }
  }

  test("the naive r*r threshold is genuinely wrong somewhere (motivation)") {
    val rng = new Random(7)
    val found = (1 to 10000).exists { _ =>
      val r = math.abs(rng.nextDouble()) * math.pow(10, rng.nextInt(12) - 6)
      VecRangeStrengthReduction.maxSqLe(r) != r * r
    }
    assert(found, "expected at least one radius where the exact boundary differs from r*r")
  }

  test("rule-optimized range filter matches driver-side sqrt semantics on real vectors") {
    GraftExtensions.install(spark)
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val q = emb.where(col("vec_id") === 4L).select(col("embedding")).first()
      .getSeq[Float](0).toArray
    val r = 1.25
    val filtered = emb
      .where(sqrt(vecL2Sq(col("embedding"), typedLit(q))) <= lit(r))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // driver-side truth with the UNREWRITTEN semantics
    val truth = emb.select(col("vec_id"), vecL2Sq(col("embedding"), typedLit(q)).as("d2"))
      .collect()
      .filter(row => math.sqrt(row.getDouble(1)) <= r)
      .map(_.getLong(0)).toSet
    assert(filtered == truth)
    assert(truth.nonEmpty)
  }

  test("the optimized plan carries no per-row sqrt and stays codegen") {
    GraftExtensions.install(spark)
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val q = Array.fill(64)(0.1f)
    val df = emb.where(sqrt(vecL2Sq(col("embedding"), typedLit(q))) <= lit(1.25))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.toLowerCase.contains("sqrt"),
      s"sqrt must be strength-reduced out of the filter:\n$optimized")
    val codegenStages = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenStages.nonEmpty)
  }
}
