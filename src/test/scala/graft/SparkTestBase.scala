package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session per suite; sf0.001 fixtures. */
trait SparkTestBase extends AnyFunSuite {
  val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkTestBase.session
}

object SparkTestBase {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      // local[4, 2]: allow ONE task re-attempt so determinism-under-retry
      // specs can inject a first-attempt failure (plain local[N] fails the
      // job on any task error)
      .master("local[4, 2]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // large heaps inflate the default page size to 64m; hash-aggregate
      // tasks then spend their time zeroing pages (measured 148s->12s on
      // the minhash pipeline at sf0.1)
      .config("spark.buffer.pageSize", "4m")
      .config("spark.ui.enabled", "false")
      // keep catalog tables (bucketed-layout tests) out of the repo tree
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
