package graft.tools

import org.apache.spark.sql.functions._
import graft.Bench
import graft.data.SyntheticImages
import graft.pipeline.Dedup
import graft.spark.{functions => gf}

/** dev tool: decomposes the banded-candidate walk's wall time at a given sf
  * into (a) the shuffle+sort+decode floor — the identical exchange consumed
  * by a trivial row-count — and (b) in-walk compute, with the walk's internal
  * work counters (runs, sub-bucket sorts, Hamming checks, emissions) so the
  * super-linear term at 10× rows can be attributed to a measured counter
  * instead of a guess. Args: sf names (default: sf0.1 sf0.3). */
object WalkStats {
  def main(args: Array[String]): Unit = {
    val sfs = if (args.nonEmpty) args.toSeq else Seq("sf0.1", "sf0.3")
    for (sf <- sfs) {
      val parts = sf match { case "sf1" => 320; case "sf0.3" => 96; case _ => 32 }
      val spark = Bench.session(32, partitions = parts)
      spark.sparkContext.setLogLevel("WARN")
      import spark.implicits._
      val corpus = SyntheticImages.ensureLite(spark, s"/root/testdata/$sf")
      val cfg = Dedup.defaultConfig
      val sigs = Dedup.signatures(corpus)
        .select(col("image_id"), col("phash"),
          gf.band_keys(col("minhash"), cfg.bands, cfg.rowsPerBand).as("bands"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nRows = sigs.count()
      val keyed = sigs
        .select(expr("cast(substring(image_id,5) as bigint)").as("id"), col("phash"),
          explode(col("bands")).as("bv"))
        .select(col("bv"), col("id"), col("phash"))
      def timed(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      // (a) the exchange floor: same repartition+sort+BandedRow decode, the
      // per-run buffering loop replaced by a count
      val tFloor = timed {
        val c = keyed.repartition(col("bv")).sortWithinPartitions(col("bv"))
          .as[Dedup.BandedRow]
          .mapPartitions { it =>
            var n = 0L
            var h = 0L // consume every field so nothing is dead-code pruned
            while (it.hasNext) { val r = it.next(); n += 1; h ^= r.bv ^ r.id ^ r.phash }
            Iterator.single(n ^ (h & 0L))
          }.reduce(_ + _)
        require(c == nRows * cfg.bands, s"floor pass saw $c rows")
      }
      // (b) the real walk, with counters
      val acc = spark.sparkContext
      val ctrs = new Dedup.WalkCounters(
        acc.longAccumulator("rows"), acc.longAccumulator("runs"),
        acc.longAccumulator("subRuns"), acc.longAccumulator("subSortedElems"),
        acc.longAccumulator("subChecks"), acc.longAccumulator("cursorChecks"),
        acc.longAccumulator("emitted"), acc.longAccumulator("subSortNanos"))
      val tWalk = timed {
        keyed.repartition(col("bv")).sortWithinPartitions(col("bv"))
          .as[Dedup.BandedRow]
          .mapPartitions(it => new Dedup.BucketRunPairs(it, cfg.hammingThreshold,
            1 << 20, markers = null, counters = ctrs))
          .toDF("id_a", "id_b").count()
      }
      println(f"WALKSTAT sf=$sf rows=$nRows banded=${ctrs.rows.value} " +
        f"floor_s=$tFloor%.2f walk_s=$tWalk%.2f inwalk_s=${tWalk - tFloor}%.2f")
      println(s"WALKSTAT sf=$sf runs=${ctrs.runs.value} subRuns=${ctrs.subRuns.value} " +
        s"subSortedElems=${ctrs.subSortedElems.value} subChecks=${ctrs.subChecks.value} " +
        s"cursorChecks=${ctrs.cursorChecks.value} emitted=${ctrs.emitted.value} " +
        f"subSortCore_s=${ctrs.subSortNanos.value / 1e9}%.2f")
      sigs.unpersist()
      spark.stop()
    }
  }
}
