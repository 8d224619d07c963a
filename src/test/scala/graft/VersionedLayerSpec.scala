package graft

import java.nio.file.Files
import graft.sources.VersionedLayer
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The Delta-semantics substitute: atomic snapshot publish, snapshot
  * isolation for in-flight readers, time travel, vacuum. */
class VersionedLayerSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark
  import spark.implicits._

  private def tmpRoot() = Files.createTempDirectory("graft-vl").toFile.getAbsolutePath + "/layer"

  test("writes publish atomically and read() follows the pointer") {
    val root = tmpRoot()
    VersionedLayer.latestVersion(spark, root) shouldBe None
    VersionedLayer.write(Seq((1, "a"), (2, "b")).toDF("k", "s"), root) shouldBe 1L
    VersionedLayer.write(Seq((3, "c")).toDF("k", "s"), root) shouldBe 2L
    VersionedLayer.latestVersion(spark, root) shouldBe Some(2L)
    VersionedLayer.read(spark, root).collect().map(_.getInt(0)).sorted shouldBe Array(3)
  }

  test("time travel reads any retained version") {
    val root = tmpRoot()
    VersionedLayer.write(Seq((1, "a")).toDF("k", "s"), root)
    VersionedLayer.write(Seq((2, "b")).toDF("k", "s"), root)
    VersionedLayer.read(spark, root, Some(1L)).collect().map(_.getInt(0)) shouldBe Array(1)
    VersionedLayer.read(spark, root, Some(2L)).collect().map(_.getInt(0)) shouldBe Array(2)
  }

  test("a reader that resolved version N is unaffected by a later publish") {
    val root = tmpRoot()
    VersionedLayer.write((1 to 100).toDF("k"), root)
    val snapshotN = VersionedLayer.read(spark, root) // resolves v=1 files now
    VersionedLayer.write((200 to 300).toDF("k"), root) // v=2 lands + publishes
    // the already-planned reader still sees the full, consistent old snapshot
    snapshotN.count() shouldBe 100
    VersionedLayer.read(spark, root).count() shouldBe 101
  }

  test("an unpublished (crashed) write leaves readers on the old version") {
    val root = tmpRoot()
    VersionedLayer.write(Seq((1, "a")).toDF("k", "s"), root)
    // simulate a writer that materialized v=2 but died before the pointer swap
    Seq((9, "x")).toDF("k", "s").write.parquet(root + "/v=2")
    VersionedLayer.latestVersion(spark, root) shouldBe Some(1L)
    VersionedLayer.read(spark, root).collect().map(_.getInt(0)) shouldBe Array(1)
    // the retry overwrites the orphan and publishes normally
    VersionedLayer.write(Seq((2, "b")).toDF("k", "s"), root) shouldBe 2L
    VersionedLayer.read(spark, root).collect().map(_.getInt(0)) shouldBe Array(2)
  }

  test("vacuum drops old snapshots but never the published one") {
    val root = tmpRoot()
    (1 to 4).foreach(i => VersionedLayer.write(Seq(i).toDF("k"), root))
    VersionedLayer.versions(spark, root) shouldBe Seq(1L, 2L, 3L, 4L)
    VersionedLayer.vacuum(spark, root, keepLast = 2)
    VersionedLayer.versions(spark, root) shouldBe Seq(3L, 4L)
    VersionedLayer.read(spark, root).collect().map(_.getInt(0)) shouldBe Array(4)
    intercept[Exception](VersionedLayer.read(spark, root, Some(1L)).collect())
  }
}
