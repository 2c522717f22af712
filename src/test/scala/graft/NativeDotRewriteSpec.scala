package graft

import org.apache.spark.sql.functions._

import graft.operators.Knn
import graft.plans.{GraftOptimizations, NativeDotRewrite}

/** The fold→kernel optimizer rule: users write the portable
  * `aggregate(zip_with(...))` dot product, the optimizer swaps in the
  * codegen'd `DotProductFloat` — results must be bit-identical and the
  * match must be narrow.
  */
class NativeDotRewriteSpec extends SparkSpec {
  import spark.implicits._

  // parquet-backed input: a LocalRelation would be constant-folded by
  // ConvertToLocalRelation in the MAIN optimizer batch, before the
  // post-hoc extraOptimizations batch this rule runs in ever sees it
  private lazy val vecs = {
    val dir = s"/tmp/graft-dotrw-${ProcessHandle.current().pid()}"
    Seq(
      (Array(1.5f, -2.25f, 3.125f), Array(0.5f, 4.0f, -1.0f)),
      (Array(0.1f, 0.2f, 0.3f), Array(0.9f, 0.8f, 0.7f)))
      .toDF("a", "b").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private def withRule[A](f: => A): A = {
    val prev = spark.experimental.extraOptimizations
    try { GraftOptimizations.install(spark); f }
    finally spark.experimental.extraOptimizations = prev
  }

  test("rewrites the canonical fold to the native kernel, values unchanged") {
    val df = vecs.select(Knn.dot(col("a"), col("b")).as("d"))
    val interpreted = df.as[Double].collect().toSeq
    withRule {
      val df2 = vecs.select(Knn.dot(col("a"), col("b")).as("d"))
      assert(df2.queryExecution.optimizedPlan.toString
        .contains("graft_dot_f32"),
        s"rule did not fire:\n${df2.queryExecution.optimizedPlan}")
      val native = df2.as[Double].collect().toSeq
      assert(native == interpreted, "kernel must be bit-identical to the fold")
    }
  }

  test("cosine (dot + norms) rewrites at every fold site") {
    withRule {
      val df = vecs.select(Knn.cosine(col("a"), col("b")).as("c"))
      val plan = df.queryExecution.optimizedPlan.toString
      // cosine = dot(a,b) / (norm(a) * norm(b)): only the a·b fold has
      // the two-variable zip_with shape; norms fold transform(x*x) and
      // stay as-is (the match is deliberately narrow)
      assert(plan.contains("graft_dot_f32"), plan)
    }
  }

  test("does not touch folds over non-float arrays or seeded folds") {
    withRule {
      val dir = s"/tmp/graft-dotrw-dbl-${ProcessHandle.current().pid()}"
      Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
        .write.mode("overwrite").parquet(dir)
      val d = spark.read.parquet(dir)
      val doublePlan = d.select(
        aggregate(zip_with(col("a"), col("b"),
          (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, x) => acc + x).as("d"))
        .queryExecution.optimizedPlan.toString
      assert(!doublePlan.contains("graft_dot_f32"),
        "array<double> fold must not be rewritten")

      val seededPlan = vecs.select(
        aggregate(zip_with(col("a"), col("b"),
          (x, y) => x.cast("double") * y.cast("double")),
          lit(1.0), (acc, x) => acc + x).as("d"))
        .queryExecution.optimizedPlan.toString
      assert(!seededPlan.contains("graft_dot_f32"),
        "non-zero seed must not be rewritten")
    }
  }
}
