package graft

import org.apache.spark.sql.functions._

/** Dev tool for the scale rehearsals (SCALE_r12 Item 6 discipline: report
  * the occupancy caps' drop counts, don't assert them): print the MinHash
  * band-bucket occupancy histogram of `SPARK_GRAFT_SF_DIR`'s documents
  * corpus, the number of buckets over [[graft.operators.Dedup
  * .defaultBucketCap]], the docs rows they hold, and the candidate-pair
  * volume the cap therefore drops (Σ C(occ, 2) over dropped buckets).
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_sf3dc sbt "runMain graft.CapProbe"
  */
object CapProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(defaultCpus = 32)
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Dedup
    val b = Dedup.bands(Dedup.minhashSignatures(
      Dedup.shingleHashes(Tables.documents(spark, dir))))
    val occ = b.groupBy("band", "bh").agg(count(lit(1)).as("occ"))
    val cap = Dedup.defaultBucketCap
    val hist = occ.select(
        count(lit(1)).as("buckets"),
        max("occ").as("max_occ"),
        expr("approx_percentile(occ, array(0.5, 0.99))").as("p"),
        sum(when(col("occ") > cap, 1).otherwise(0)).as("dropped_buckets"),
        sum(when(col("occ") > cap, col("occ"))).as("dropped_rows"),
        sum(when(col("occ") > cap, col("occ") * (col("occ") - 1) / 2))
          .as("dropped_pairs"))
      .first()
    println(s"dir=$dir cap=$cap buckets=${hist.getLong(0)} " +
      s"max_occ=${hist.getLong(1)} p50/p99=${hist.getSeq[Double](2).mkString("/")} " +
      s"dropped_buckets=${hist.getLong(3)} dropped_rows=${hist.get(4)} " +
      s"dropped_pairs=${hist.get(5)}")
    spark.stop()
  }
}
