package graft.expressions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.VectorOps

class FloatDotProductSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf0001)

  test("native dot is bit-identical to the HOF formulation on real vectors") {
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val both = emb.crossJoin(broadcast(q)).select(
      VectorOps.dot(col("embedding"), col("qe")).as("native"),
      VectorOps.dotHof(col("embedding"), col("qe")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("l2sq computes squared euclidean distance") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f), Array(4.0f, 6.0f))).toDF("a", "b")
    assert(df.select(VectorOps.l2sq(col("a"), col("b"))).head.getDouble(0) == 25.0)
  }

  test("cosine of a zero vector is 0.0 (guarded, not null/NaN)") {
    import spark.implicits._
    val df = Seq((Array(0.0f, 0.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    assert(df.select(VectorOps.cosine(col("a"), col("b"))).head.getDouble(0) == 0.0)
  }

  test("null array yields null; known values compute exactly") {
    import spark.implicits._
    val df = Seq(
      (Some(Array(1.0f, 2.0f, 3.0f)), Some(Array(4.0f, 5.0f, 6.0f))),
      (None, Some(Array(1.0f)))).toDF("a", "b")
    val out = df.select(VectorOps.dot(col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) == 32.0)
    assert(out(1).isNullAt(0))
  }

  test("the expression participates in whole-stage codegen") {
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val df = emb.crossJoin(broadcast(q))
      .select(VectorOps.dot(col("embedding"), col("qe")).as("d"))
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    // `*(n)` marks a WholeStageCodegen stage; the project computing the dot
    // product must be inside one.
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[floatdotproduct.*"))
  }
}
