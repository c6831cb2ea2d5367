package graft.tools

import graft.GraftSession
import graft.operators.Audio

/** Mega-bucket stress for audio_dedup's occupancy cap (SCALE.md round
  * 10): k near-identical tracks through the REAL codec, all landing in
  * ONE band bucket with DISTINCT envelope signatures — the input the
  * exact class collapse provably cannot shrink (round 9's recorded
  * residual). Without the cap the band join scores C(k,2) candidates
  * (~7.2e7 at k=12000); with it, <= DedupAnchors·k per band. Run at a
  * few k to see the elapsed curve stay linear-ish:
  *
  *   sbt "runMain graft.tools.AudioMegaBucket 3000 6000 12000"
  *
  * Prints per k: elapsed, output rows (expect k−1 — full recall, every
  * non-anchor member deduped against anchor 0), and distinct reps.
  */
object AudioMegaBucket {
  def main(args: Array[String]): Unit = {
    val ks = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(3000, 6000, 12000)
    val spark = GraftSession.build("graft-audio-megabucket")
    ks.foreach { k =>
      val t0 = System.nanoTime()
      val out = Audio.dedupFromEnvelopes(
        Audio.envelope16(Audio.megaClusterTracks(spark, k))).collect()
      val secs = (System.nanoTime() - t0) / 1e9
      val reps = out.map(_.getAs[Long]("rep_id")).distinct.sorted
      val recallOk = out.length == k - 1 &&
        out.map(_.getAs[Long]("doc_id")).toSet == (1L until k.toLong).toSet
      println(f"k=$k%6d elapsed=$secs%7.2fs rows=${out.length}%6d " +
        f"recall_complete=$recallOk reps=${reps.mkString(",")}")
    }
    spark.stop()
  }
}
