package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Classical statistical-test queries — the "is this difference real"
  * layer a metrics warehouse runs on top of its aggregates. All three are
  * single-scan moment computations: the shuffle carries a handful of
  * (group, n, Σx, Σx², Σxy) state rows, the closed forms run on the tiny
  * aggregate, and every double is derived from exact DECIMAL moments cast
  * once — the same determinism discipline as q44/q62/q72, so the DuckDB
  * oracles fold bit-identically.
  */
object StatQueries {

  /** Q77 — chi-square independence profile of `l_returnflag` ×
    * `l_linestatus`: the observed contingency table with each cell's
    * expected count under independence and its chi-square contribution.
    * One partial-aggregable crosstab; row totals, column totals and N ride
    * broadcasts; expected counts multiply DOUBLES (never a bigint product
    * that overflows at 100 TB row counts), derived identically in the
    * oracle.
    */
  def chi2(s: SparkSession, dir: String): DataFrame = {
    val obs = Tables.lineitem(s, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("o"))
    val rt = obs.groupBy("l_returnflag").agg(sum("o").as("rt"))
    val ct = obs.groupBy("l_linestatus").agg(sum("o").as("ct"))
    val n = obs.agg(sum("o").cast("double").as("N"))
    val e = col("rt").cast("double") * col("ct").cast("double") / col("N")
    obs.join(broadcast(rt), "l_returnflag")
      .join(broadcast(ct), "l_linestatus")
      .crossJoin(broadcast(n))
      .select(col("l_returnflag"), col("l_linestatus"), col("o"),
        round(e, 6).as("expected"),
        round((col("o") - e) * (col("o") - e) / e, 6).as("contrib"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Q78 — Welch's two-sample t-test per event type, arms split by
    * `user_id % 2` (the deterministic stand-in for an experiment
    * assignment): per-arm mergeable moment states (n, Σx, Σx²) in exact
    * DECIMAL, then the t statistic and Welch–Satterthwaite degrees of
    * freedom in closed form. The state rollup is ONE partial-aggregable
    * pass over the events; the arm join runs on the types-sized frame.
    * Spark and the oracle share every intermediate: decimal-quantized
    * inputs, cast-once doubles, identical expression text.
    */
  def abtest(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.spread(Tables.events(s, dir)).select(
      col("event_type"), (col("user_id") % 2).as("grp"), col("value"))
    val st = ev.groupBy("event_type", "grp").agg(
      count(lit(1)).as("n"),
      sum(col("value").cast("decimal(28,6)")).as("s"),
      sum((col("value") * col("value")).cast("decimal(38,6)")).as("ss"))
    def arm(g: Int, suf: String): DataFrame = st.filter(col("grp") === g)
      .select(col("event_type"), col("n").as(s"n$suf"),
        col("s").as(s"s$suf"), col("ss").as(s"ss$suf"))
    def meanOf(suf: String): Column =
      col(s"s$suf").cast("double") / col(s"n$suf")
    // sample variance from exact moments: (n·Σx² − (Σx)²) / (n·(n−1))
    def varOf(suf: String): Column = {
      val nDec = col(s"n$suf").cast("decimal(20,0)")
      val nd = col(s"n$suf").cast("double")
      (nDec * col(s"ss$suf") - col(s"s$suf") * col(s"s$suf")).cast("double") /
        (nd * (nd - 1))
    }
    val sea = varOf("a") / col("na")
    val seb = varOf("b") / col("nb")
    arm(0, "a").join(arm(1, "b"), "event_type")
      .select(col("event_type"), col("na"), col("nb"),
        round(meanOf("a"), 6).as("mean_a"),
        round(meanOf("b"), 6).as("mean_b"),
        round((meanOf("a") - meanOf("b")) / sqrt(sea + seb), 6).as("t_stat"),
        round((sea + seb) * (sea + seb) /
          (sea * sea / (col("na") - 1) + seb * seb / (col("nb") - 1)), 6).as("df"))
      .orderBy("event_type")
  }

  /** The numeric lineitem columns [[corr]] profiles, with short labels
    * shared by the Spark plan and the generated oracle.
    */
  val corrCols: Seq[(String, String)] = Seq(
    "q" -> "l_quantity", "p" -> "l_extendedprice",
    "d" -> "l_discount", "t" -> "l_tax")

  /** Q79 — Pearson correlation matrix of the numeric lineitem measures in
    * ONE scan: every Σx, Σx², Σxy moment accumulates as exact DECIMAL in a
    * single aggregate row (shuffle carries 15 numbers), and the six
    * pairwise correlations unfold from it with cast-once doubles — never
    * six passes, never a double accumulation whose order an engine could
    * vary.
    */
  def corr2(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.spread(Tables.lineitem(s, dir)).select(
      corrCols.map { case (a, c) => col(c).cast("decimal(18,6)").as(a) }: _*)
    val pairs = corrCols.map(_._1).combinations(2).map { case Seq(a, b) => (a, b) }.toSeq
    val moments = base.agg(
      count(lit(1)).as("n"),
      corrCols.map { case (a, _) => sum(col(a)).as(s"s_$a") } ++
        corrCols.map { case (a, _) =>
          sum((col(a) * col(a)).cast("decimal(38,12)")).as(s"ss_$a") } ++
        pairs.map { case (a, b) =>
          sum((col(a) * col(b)).cast("decimal(38,12)")).as(s"sp_${a}_$b") }: _*)
    // closed forms run in DOUBLE from cast-once moments: the Σx·Σy cross
    // products overflow 38-digit decimal (int128) at even verify scale,
    // so BOTH engines cast each exact decimal moment to double first and
    // share the identical IEEE expression from there.
    val rows = pairs.map { case (a, b) =>
      val nd = col("n").cast("double")
      def sD(x: String): Column = col(s"s_$x").cast("double")
      def m2(x: String): Column =
        nd * col(s"ss_$x").cast("double") - sD(x) * sD(x)
      val cov = nd * col(s"sp_${a}_$b").cast("double") - sD(a) * sD(b)
      struct(lit(s"${corrCols.toMap.apply(a)}~${corrCols.toMap.apply(b)}").as("pair"),
        round(cov / (sqrt(m2(a)) * sqrt(m2(b))), 6).as("r"))
    }
    moments
      .select(col("n"), explode(array(rows: _*)).as("e"))
      .select(col("e.pair").as("pair"), col("e.r").as("r"), col("n"))
      .orderBy("pair")
  }

  /** DuckDB mirrors — moment CTEs + identical closed forms. */
  val oracle: Map[String, String] = Map(
    "q77_chi2" ->
      """WITH obs AS (SELECT l_returnflag, l_linestatus, count(*) AS o
        |  FROM lineitem GROUP BY 1, 2),
        |rt AS (SELECT l_returnflag, sum(o) AS rt FROM obs GROUP BY 1),
        |ct AS (SELECT l_linestatus, sum(o) AS ct FROM obs GROUP BY 1),
        |nn AS (SELECT CAST(sum(o) AS DOUBLE) AS N FROM obs)
        |SELECT obs.l_returnflag, obs.l_linestatus, obs.o,
        |  round(CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / N, 6) AS expected,
        |  round((obs.o - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / N)
        |      * (obs.o - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / N)
        |      / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / N), 6) AS contrib
        |FROM obs JOIN rt USING (l_returnflag) JOIN ct USING (l_linestatus), nn
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q78_abtest" ->
      """WITH st AS (SELECT event_type, user_id % 2 AS grp, count(*) AS n,
        |    sum(CAST(value AS DECIMAL(28,6))) AS s,
        |    sum(CAST(value * value AS DECIMAL(38,6))) AS ss
        |  FROM events GROUP BY 1, 2),
        |j AS (SELECT a.event_type, a.n AS na, b.n AS nb,
        |    CAST(a.s AS DOUBLE) / a.n AS ma, CAST(b.s AS DOUBLE) / b.n AS mb,
        |    CAST(CAST(a.n AS DECIMAL(20,0)) * a.ss - a.s * a.s AS DOUBLE)
        |      / (CAST(a.n AS DOUBLE) * (CAST(a.n AS DOUBLE) - 1)) / a.n AS sea,
        |    CAST(CAST(b.n AS DECIMAL(20,0)) * b.ss - b.s * b.s AS DOUBLE)
        |      / (CAST(b.n AS DOUBLE) * (CAST(b.n AS DOUBLE) - 1)) / b.n AS seb
        |  FROM st a JOIN st b ON a.event_type = b.event_type
        |  WHERE a.grp = 0 AND b.grp = 1)
        |SELECT event_type, na, nb, round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
        |  round((ma - mb) / sqrt(sea + seb), 6) AS t_stat,
        |  round((sea + seb) * (sea + seb)
        |    / (sea * sea / (na - 1) + seb * seb / (nb - 1)), 6) AS df
        |FROM j ORDER BY event_type""".stripMargin,
    "q79_corr" -> {
      val cols = corrCols
      val pairs = cols.map(_._1).combinations(2).map { case Seq(a, b) => (a, b) }.toSeq
      // the inner products use DECIMAL(19,6) operands: DuckDB evaluates an
      // (18,6)x(18,6) multiply on int64 and throws on overflow instead of
      // promoting; at 19 digits it runs in int128. The values are exact at
      // scale 12 either way, identical to Spark's (18,6) products.
      val moms =
        cols.map { case (a, c) =>
          s"sum(CAST($c AS DECIMAL(18,6))) AS s_$a" } ++
        cols.map { case (a, c) =>
          s"sum(CAST(CAST($c AS DECIMAL(19,6)) * CAST($c AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS ss_$a" } ++
        pairs.map { case (a, b) =>
          val ca = cols.toMap.apply(a); val cb = cols.toMap.apply(b)
          s"sum(CAST(CAST($ca AS DECIMAL(19,6)) * CAST($cb AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS sp_${a}_$b" }
      def sD(x: String) = s"CAST(s_$x AS DOUBLE)"
      def m2(x: String) =
        s"(CAST(n AS DOUBLE) * CAST(ss_$x AS DOUBLE) - ${sD(x)} * ${sD(x)})"
      val sel = pairs.map { case (a, b) =>
        val label = s"${cols.toMap.apply(a)}~${cols.toMap.apply(b)}"
        s"""SELECT '$label' AS pair,
           |  round((CAST(n AS DOUBLE) * CAST(sp_${a}_$b AS DOUBLE) - ${sD(a)} * ${sD(b)})
           |    / (sqrt(${m2(a)}) * sqrt(${m2(b)})), 6) AS r,
           |  n FROM m""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH m AS (SELECT count(*) AS n, ${moms.mkString(", ")} FROM lineitem)
         |SELECT pair, r, n FROM ($sel) u ORDER BY pair""".stripMargin
    }
  )
}
