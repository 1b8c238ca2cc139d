package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session — sbt forks
  * a single test JVM, so getOrCreate dedupes across suites).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = {
    // Spark's session-wide ObservationManager$Listener (registered by the
    // first Observation use — TableLog CHECK constraints) RETHROWS every
    // failed QueryExecution's exception into the ExecutionListenerBus,
    // which logs a full ERROR stack trace — one per intercept[]-EXPECTED
    // failure in these suites (round-10 CI-noise wart). The listener is
    // Spark-internal and must stay registered, so silence exactly that
    // bus logger; real failures still fail tests through behavior.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.util.ExecutionListenerBus",
      org.apache.logging.log4j.Level.FATAL)
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  /** sf0.001 driver testdata (smoke scale) */
  val sfDir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    // keep the session alive for other suites; sbt tears the JVM down
    super.afterAll()
  }
}
