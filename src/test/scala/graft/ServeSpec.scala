package graft

import java.sql.DriverManager

/** The resident JDBC endpoint ([[Serve]]) actually serves a §2 analysis:
  * starts HiveServer2 in-process over sf0.001, connects with the Hive JDBC
  * driver like an external dashboard would, and reads `a1_volatility`
  * (§2 A1) plus a base-table aggregate through real Thrift round-trips.
  */
class ServeSpec extends SparkSpec {

  test("thrift endpoint serves the A1 volatility analysis over JDBC") {
    val port = 10816 // fixed uncommon port; sandbox runs one test JVM
    val server = Serve.start(spark, sfDir, port)
    try {
      assert(Serve.awaitPort(port), s"HiveServer2 did not open port $port")
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      val conn = DriverManager.getConnection(
        s"jdbc:hive2://localhost:$port/", "anonymous", "")
      try {
        // §2 A1 served as a view — what the reference's Grafana panel charts
        val rs = conn.createStatement().executeQuery(
          "SELECT count(*) AS n, count(DISTINCT user_id) AS n_users " +
            "FROM global_temp.q_a1_volatility")
        assert(rs.next())
        val (n, users) = (rs.getLong(1), rs.getLong(2))
        assert(n > 0, "a1_volatility served 0 rows")
        assert(users > 0)
        // and the served rows equal the batch engine's own result
        val direct = graft.analytics.Analytics.volatility(spark, sfDir).count()
        assert(n == direct, s"JDBC row count $n != direct $direct")
        // base tables are served too (ad-hoc dashboard queries)
        val rs2 = conn.createStatement().executeQuery(
          "SELECT count(*) FROM global_temp.lineitem")
        assert(rs2.next() && rs2.getLong(1) > 0)
      } finally conn.close()
    } finally server.stop()
  }
}
