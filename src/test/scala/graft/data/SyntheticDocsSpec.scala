package graft.data

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Cache semantics of [[SyntheticDocs.ensure]]: the `_spec` sidecar must
  * make the cached corpus regenerate when the Spec changes — serving a
  * stale corpus under a freshly-interpolated report header would publish a
  * measurement that misdescribes its own input (second review pass). */
class SyntheticDocsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("ensure regenerates on spec change, reuses on spec match") {
    spark.sparkContext.setLogLevel("WARN")
    val name = "spectest"
    val dir = new java.io.File(SyntheticDocs.path(name))
    def rmrf(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rmrf)
      f.delete(): Unit
    }
    rmrf(dir)
    try {
      val small = SyntheticDocs.Spec(
        megaTemplates = 1, megaMembers = 20, smallClusters = 5,
        smallMembers = 2, noise = 30)
      assert(SyntheticDocs.ensure(spark, name, small).count() === small.rows)
      val specFile = new java.io.File(dir, "_spec")
      assert(specFile.isFile, "_spec sidecar not written")
      assert(new String(java.nio.file.Files.readAllBytes(specFile.toPath),
        "UTF-8") === small.toString)

      // same spec: served from cache (sidecar mtime untouched)
      val mtime = specFile.lastModified()
      assert(SyntheticDocs.ensure(spark, name, small).count() === small.rows)
      assert(specFile.lastModified() === mtime, "cache was regenerated on a spec MATCH")

      // changed spec: regenerated, row count follows the NEW spec
      val bigger = small.copy(noise = 45)
      assert(SyntheticDocs.ensure(spark, name, bigger).count() === bigger.rows)
      assert(new String(java.nio.file.Files.readAllBytes(specFile.toPath),
        "UTF-8") === bigger.toString)

      // legacy cache without a sidecar (pre-sidecar layout): regenerated
      new java.io.File(dir, "_spec").delete()
      assert(SyntheticDocs.ensure(spark, name, bigger).count() === bigger.rows)
      assert(new java.io.File(dir, "_spec").isFile)
    } finally rmrf(dir)
  }

  test("SyntheticEmbeddings.ensure regenerates on seed change") {
    spark.sparkContext.setLogLevel("WARN")
    val n = 37L
    val dir = new java.io.File(SyntheticEmbeddings.path(n))
    def rmrf(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rmrf)
      f.delete(): Unit
    }
    rmrf(dir)
    try {
      def firstVec(seed: Long): Seq[Float] =
        SyntheticEmbeddings.ensure(spark, n, seed)
          .orderBy("vec_id").head().getSeq[Float](1)
      val a = firstVec(1L)
      val b = firstVec(2L) // path is the same — only the sidecar differs
      assert(a !== b, "seed change served the stale cached vectors")
      assert(firstVec(2L) === b) // same seed: cache reused, stable
    } finally rmrf(dir)
  }
}
