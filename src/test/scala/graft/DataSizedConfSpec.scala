package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** GraftSession data-sized regime contract: input volume is measured
  * RECURSIVELY over regular files (dir-shaped tables count), and the
  * small-data regime (AQE off, ~2 MiB/task fan-out floored at 8)
  * engages only below the threshold — at or above it the settings are
  * the cluster regime (AQE on, fan-out converging to cpus). Pure
  * decision function tested; no sessions built (a builder.getOrCreate
  * here would hijack the shared test session). */
class DataSizedConfSpec extends AnyFunSuite {

  test("inputMb walks nested table directories, not just top-level files") {
    val dir = Files.createTempDirectory("dsconf")
    try {
      val sub = Files.createDirectories(dir.resolve("t.parquet"))
      Files.write(sub.resolve("part-0"), new Array[Byte](3 << 20))
      Files.write(dir.resolve("flat.parquet"), new Array[Byte](2 << 20))
      assert(GraftSession.inputMb(dir.toString) == 5L)
    } finally {
      // clean the 5 MiB per run — sbt test runs accumulate on this box
      import scala.jdk.CollectionConverters._
      Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.deleteIfExists(_))
    }
  }

  test("inputMb falls back to the assume-big default on a missing dir") {
    assert(GraftSession.inputMb("/nonexistent/graft-dsconf") == 1024L)
  }

  test("small input: AQE off, fan-out floored at 8") {
    assert(GraftSession.dataSizedSettings(17L, 32) == ((8, false)))
    assert(GraftSession.dataSizedSettings(0L, 32) == ((8, false)))
  }

  test("threshold and above: AQE on, fan-out converges to cpus") {
    assert(GraftSession.dataSizedSettings(1024L, 32) == ((32, true)))
    assert(GraftSession.dataSizedSettings(10240L, 32) == ((32, true)))
    // between 16 MiB and the AQE threshold the fan-out scales ~mb/2
    assert(GraftSession.dataSizedSettings(40L, 32) == ((20, false)))
  }

  test("the 8-task floor wins over the cpu cap on small hosts") {
    // cpus=4 still gets 8 partitions: two task waves beat under-spread
    // CPU kernels (documented at dataSizedSettings; a future 'fix'
    // honoring the cap over the floor must change this pin knowingly)
    assert(GraftSession.dataSizedSettings(17L, 4) == ((8, false)))
    assert(GraftSession.dataSizedSettings(10240L, 4) == ((8, true)))
  }
}
