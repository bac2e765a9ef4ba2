package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs (one per suite, lazy). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Tables.configure(SparkSession.builder()
    .master("local[4]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false"))
    .getOrCreate()

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** A fresh session ON THE SAME SparkContext with graft's Catalyst
    * extensions applied via the programmatic production path
    * (`.withExtensions`) — `spark.sql.extensions=graft.plans.
    * GraftExtensions` is equivalent but is a STATIC conf read at
    * SparkContext creation, which the shared test context predates.
    * getOrCreate builds a new SparkSession (honoring the builder's
    * extensions) once no active/default session is set; the shared
    * session is restored afterwards. */
  def withExtendedSession[A](f: SparkSession => A): A = {
    spark // force the shared session (and its SparkContext) to exist
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = Tables.configure(SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.plans.GraftExtensions))
        .getOrCreate()
      try f(ext)
      finally {
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
      }
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
