package graft.streaming

import org.apache.spark.sql.DataFrame

/** Test helper: materialize a DataFrame as a file-stream source whose
  * micro-batches arrive in event-time order. FileStreamSource orders files
  * by MODIFICATION time and a single parquet write stamps every part file
  * identically, so the parts are staged and re-copied with strictly
  * increasing mtimes following the range partitioning on `tsCol`. */
object StreamFixtures {
  def writeTimeOrdered(df: DataFrame, tsCol: String, srcDir: String, nFiles: Int): Unit = {
    import org.apache.spark.sql.functions.col
    val stageDir = java.nio.file.Files.createTempDirectory("stream-stage").toString
    df.repartitionByRange(nFiles, col(tsCol)).write.mode("overwrite").parquet(stageDir)
    val parts = new java.io.File(stageDir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    val base = System.currentTimeMillis() - 3600000L
    parts.zipWithIndex.foreach { case (f, i) =>
      val dst = java.nio.file.Paths.get(srcDir, f.getName)
      java.nio.file.Files.copy(f.toPath, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(base + i * 60000L))
    }
  }
}
