package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class LayoutSpec extends SparkSpec {

  test("zvalue/unzvalue roundtrip recovers both dimensions exactly") {
    import spark.implicits._
    val keys = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (40000L, 7L)).toDF("x", "y")
    val bad = keys
      .withColumn("z", Layout.zvalue(col("x"), col("y")))
      .filter(Layout.unzvalue(col("z"), 0) =!= col("x") ||
              Layout.unzvalue(col("z"), 1) =!= col("y"))
      .count()
    assert(bad == 0)
  }

  test("zvalue is monotone on the diagonal and bounded by 2*zBits bits") {
    import spark.implicits._
    val d = (0L until 1000L).map(i => (i, i)).toDF("x", "y")
      .withColumn("z", Layout.zvalue(col("x"), col("y")))
    // (i, i) interleaves each bit twice -> z = 3 * "spread"(i), strictly
    // increasing in i; all values fit in 32 bits
    val rows = d.orderBy("x").select("z").collect().map(_.getLong(0))
    assert(rows.toSeq == rows.sorted.toSeq)
    assert(rows.forall(z => z >= 0 && z < (1L << (2 * Layout.zBits))))
  }

  test("z-ordered staging concentrates a 2-D box into few range partitions") {
    val li = Tables.lineitem(spark, sf0001)
    val parts = 16
    val staged = Layout.zorderBy(li, col("l_suppkey"), col("l_partkey"), parts)
      .cache()
    try {
      // a small box in BOTH dimensions: with z-ordered range partitioning
      // the box's rows live on a short z interval -> few partitions; a
      // single-column sort could not bound the other dimension.
      val box = staged.filter(col("l_suppkey") < 4 && col("l_partkey") < 50)
        .select(spark_partition_id().as("p"))
      val boxRows = box.count()
      val touched = box.distinct().count()
      assert(boxRows > 0, "box must be non-empty for the assertion to mean anything")
      // Range-partition boundaries come from sampling (seed varies per run),
      // so the exact count wobbles by ±1; parts/2 still separates locality
      // (a handful of curve-prefix partitions) from a hash layout (all 16).
      assert(touched <= parts / 2,
        s"2-D box touched $touched of $parts range partitions — z-order locality lost")
      // Deterministic core of the claim: x<4, y<50 ⊆ the 2-bit × 6-bit corner,
      // whose Morton codes are exactly the interval [0, 4096) — the box lives
      // on one short prefix of the curve regardless of where boundaries fall.
      val zMax = staged.filter(col("l_suppkey") < 4 && col("l_partkey") < 50)
        .agg(max(Layout.zvalue(col("l_suppkey"), col("l_partkey")))).head.getLong(0)
      assert(zMax < 4096L, s"box z-values escape the corner interval: $zMax")
    } finally staged.unpersist()
  }
}
