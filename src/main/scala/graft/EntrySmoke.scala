package graft

/** Mirrors the driver's t1 smoke: run `SparkEntry.entry` and assert rows>0. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(defaultCpus = 8)
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(25, truncate = false)
    println(s"ENTRY_ROWS=$n")
    require(n > 0, "entry returned no rows")
    spark.stop()
  }
}
