package graft.tools

import org.apache.spark.sql.functions._
import graft.Bench
import graft.data.SyntheticImages
import graft.pipeline.Dedup
import graft.spark.{functions => gf}

/** dev tool (r6): decompose the banded walk's exchange floor — shuffle
  * alone, +in-partition sort, +typed BandedRow decode — so the optimization
  * targets the measured term. Interleaved rounds (host drift). */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    Bench.sweepStaleLocalDirs()
    val spark = Bench.session(32, partitions = 32)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val corpus = SyntheticImages.ensure(spark, "/root/testdata/sf0.1")
    val cfg = Dedup.defaultConfig
    val sigs = Dedup.signatures(corpus)
      .select(expr("cast(substring(image_id,5) as bigint)").as("id"), col("phash"),
        gf.band_keys(col("minhash"), cfg.bands, cfg.rowsPerBand).as("bands"))
      .localCheckpoint()
    println(s"FLOOR sigs=${sigs.count()}")
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"FLOOR $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    def base = sigs.select(explode(col("bands")).as("bv"), col("id"), col("phash"))
    (1 to 3).foreach { _ =>
      t("explode_only") {
        val n = base.queryExecution.toRdd.mapPartitions { it =>
          var n = 0L; var h = 0L
          while (it.hasNext) { val r = it.next(); n += 1; h ^= r.getLong(0) }
          Iterator.single(n ^ (h & 0L))
        }.reduce(_ + _)
        require(n > 0)
      }
      t("exchange") {
        val n = base.repartition(col("bv")).queryExecution.toRdd.mapPartitions { it =>
          var n = 0L; var h = 0L
          while (it.hasNext) { val r = it.next(); n += 1; h ^= r.getLong(0) }
          Iterator.single(n ^ (h & 0L))
        }.reduce(_ + _)
        require(n > 0)
      }
      t("exchange_sort") {
        val n = base.repartition(col("bv")).sortWithinPartitions(col("bv"))
          .queryExecution.toRdd.mapPartitions { it =>
            var n = 0L; var h = 0L
            while (it.hasNext) { val r = it.next(); n += 1; h ^= r.getLong(0) }
            Iterator.single(n ^ (h & 0L))
          }.reduce(_ + _)
        require(n > 0)
      }
      t("exchange_sort_decode") {
        val n = base.repartition(col("bv")).sortWithinPartitions(col("bv"))
          .select(col("bv"), col("id"), col("phash"))
          .as[Dedup.BandedRow]
          .mapPartitions { it =>
            var n = 0L; var h = 0L
            while (it.hasNext) { val r = it.next(); n += 1; h ^= r.bv }
            Iterator.single(n ^ (h & 0L))
          }.reduce(_ + _)
        require(n > 0)
      }
      for (parts <- Seq(96, 256, 1024)) {
        t(s"exch_sort_p$parts") {
          val n = base.repartition(parts, col("bv")).sortWithinPartitions(col("bv"))
            .queryExecution.toRdd.mapPartitions { it =>
              var n = 0L; var h = 0L
              while (it.hasNext) { val r = it.next(); n += 1; h ^= r.getLong(0) }
              Iterator.single(n ^ (h & 0L))
            }.reduce(_ + _)
          require(n > 0)
        }
      }
    }
    spark.stop()
  }
}
