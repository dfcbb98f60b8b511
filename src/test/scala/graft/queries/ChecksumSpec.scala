package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChecksumSpec extends SparkSpec {
  import spark.implicits._

  private def checksum(df: org.apache.spark.sql.DataFrame) =
    df.select(pmod(col("k"), lit(16)).as("bucket"),
        conv(substring(md5(concat_ws("|", col("k"), col("v"))), 1, 15), 16, 10)
          .cast("long").as("h"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"), bit_xor(col("h")).as("checksum"))
      .orderBy("bucket")
      .collect().toSeq

  test("checksum is invariant under row order and partitioning") {
    val rows = (0L until 500L).map(i => (i, s"val$i"))
    val a = checksum(rows.toDF("k", "v").repartition(1))
    val b = checksum(scala.util.Random.shuffle(rows).toDF("k", "v").repartition(13))
    assert(a === b)
  }

  test("checksum catches a single changed row, and names its bucket") {
    val rows = (0L until 500L).map(i => (i, s"val$i"))
    val mutated = rows.updated(123, (123L, "valXXX"))
    val a = checksum(rows.toDF("k", "v"))
    val b = checksum(mutated.toDF("k", "v"))
    val diff = a.zip(b).filter { case (x, y) => x != y }
    assert(diff.length === 1)
    assert(diff.head._1.getLong(0) === 123L % 16)
    // counts agree (same cardinality), only the checksum moved
    assert(diff.head._1.getLong(1) === diff.head._2.getLong(1))
  }

  test("a dropped row changes both the count and the checksum of one bucket") {
    val rows = (0L until 500L).map(i => (i, s"val$i"))
    val a = checksum(rows.toDF("k", "v"))
    val b = checksum(rows.filterNot(_._1 == 77L).toDF("k", "v"))
    val diff = a.zip(b).filter { case (x, y) => x != y }
    assert(diff.length === 1 && diff.head._1.getLong(0) === 77L % 16)
    assert(diff.head._1.getLong(1) === diff.head._2.getLong(1) + 1)
  }
}
