package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** IVF assign-cost sweep: times the index build (seed → Lloyd refine →
  * argmin assign → cell profile) on synthetic diverse corpora at
  * growing n, under (a) the default √n centroid rule and (b) a fixed
  * modulus 50 via `spark.graft.ivf.centroidMod` — the round-8 rule,
  * kept reachable through the conf knob precisely so this comparison
  * stays runnable.
  *
  * Expected shape: fixed-50 cost is n·(n/50) cosines (quadratic — the
  * round-8 scale defect), √n-rule cost is ~2·n·√n; the gap must WIDEN
  * with n. Results are recorded in SCALE.md (IVF assign-cost model).
  *
  * Usage: sbt "runMain graft.tools.IvfSweep 30000 100000 300000"
  */
object IvfSweep {
  def main(args: Array[String]): Unit = {
    val ns = if (args.nonEmpty) args.map(_.toLong).toSeq
             else Seq(30000L, 100000L, 300000L)
    val spark = GraftSession.build("graft-ivf-sweep")
    def vecsOf(n: Long) = spark.range(n).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 7), j -> " +
        "CAST(pmod((id + 1) * (j + 3) * 2654435761 + id * id * 40503, 1000003) " +
        "AS DOUBLE) / 100000 - 5)").as("v"))
    def run(label: String, n: Long): Unit = {
      val t0 = System.nanoTime()
      val prof = graft.operators.Similarity.cellProfileFor(vecsOf(n))
        .agg(count(lit(1)).as("cells"), max("n_vecs").as("max_cell")).head()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[ivf-sweep] rule=$label%-7s n=$n%-8d cells=${prof.getLong(0)}%-6d " +
        f"max_cell=${prof.getLong(1)}%-6d sec=$sec%.2f")
    }
    for (n <- ns) run("sqrt-n", n)
    spark.conf.set("spark.graft.ivf.centroidMod", "50")
    for (n <- ns) run("fixed50", n)
    spark.conf.unset("spark.graft.ivf.centroidMod")
    spark.stop()
  }
}
