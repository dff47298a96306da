package graft

/** The cluster-deployment entry point (`--conf
  * spark.sql.extensions=graft.GraftExtensions`) must install vec_dot and
  * the banded-interval-join rule with NO driver code. The shared test
  * session is built with exactly that conf (SparkSpec), so these assertions
  * exercise the same path spark-submit would.
  */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot resolves in SQL with no manual register call") {
    assert(spark.conf.get("spark.sql.extensions") == "graft.GraftExtensions")
    assert(spark.sql("SELECT vec_dot(array(1d, 2d), array(3d, 4d)) AS d")
      .head().getDouble(0) == 11.0)
  }

  test("the banded rule is injected: pure range joins rewrite, equi+range joins don't") {
    Seq((1L, 10L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      (2L, 11L, java.sql.Timestamp.valueOf("2024-01-01 10:02:00")))
      .toDF("user_id", "event_id", "ts").createOrReplaceTempView("ext_ev")
    spark.conf.set("spark.graft.bandedIntervalJoin.smallSideThreshold", "0")
    try {
      // pure range join: rewritten by the injected rule, with NO
      // experimental.extraOptimizations involvement
      assert(spark.experimental.extraOptimizations.isEmpty)
      val pure = spark.sql(
        """SELECT a.event_id FROM ext_ev a JOIN ext_ev b
          |  ON b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 300 SECOND""".stripMargin)
        .queryExecution.optimizedPlan.toString
      assert(pure.contains("__graft_bin"), s"injected rule did not fire:\n$pure")
      // an equi conjunct means Spark hash-joins already — banding would
      // only add a 2x probe-side explode, so the rule must decline
      val equi = spark.sql(
        """SELECT a.event_id FROM ext_ev a JOIN ext_ev b
          |  ON a.user_id = b.user_id
          | AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 300 SECOND""".stripMargin)
        .queryExecution.optimizedPlan.toString
      assert(!equi.contains("__graft_bin"),
        s"rule must not band an equi+range join:\n$equi")
      // hot-equi-key opt-in: with bandEquiJoins set the same join rewrites
      spark.conf.set("spark.graft.bandedIntervalJoin.bandEquiJoins", "true")
      val hot = spark.sql(
        """SELECT a.event_id FROM ext_ev a JOIN ext_ev b
          |  ON a.user_id = b.user_id
          | AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 300 SECOND""".stripMargin)
        .queryExecution.optimizedPlan.toString
      assert(hot.contains("__graft_bin"),
        s"bandEquiJoins opt-in must band the hot-key join:\n$hot")
    } finally {
      spark.conf.unset("spark.graft.bandedIntervalJoin.smallSideThreshold")
      spark.conf.unset("spark.graft.bandedIntervalJoin.bandEquiJoins")
    }
  }
}
