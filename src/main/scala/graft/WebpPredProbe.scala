package graft

import org.apache.spark.sql.graftnative.{ImageDecode, WebpSynth}

/** Dev utility: split the webp_pred lane's wall time into its encode
  * (fixture synthesis) and decode halves on one thread — the stress
  * lane times synthesize→decode as one pipeline, so a decoder-side
  * optimization is invisible if the ENCODER dominates. Run:
  * `runMain graft.WebpPredProbe [dim] [n]`.
  */
object WebpPredProbe {
  def main(args: Array[String]): Unit = {
    val dim = if (args.length > 0) args(0).toLong else 32L
    val n = if (args.length > 1) args(1).toInt else 4000
    // warm-up
    var i = 0
    while (i < 3000) {
      val b = WebpSynth.webpBytesPred(dim, dim, i)
      ImageDecode.compute(b)
      i += 1
    }
    var tSynth = 0L
    var tDec = 0L
    var sink = 0L
    i = 0
    while (i < n) {
      val t0 = System.nanoTime()
      val b = WebpSynth.webpBytesPred(dim, dim, i)
      val t1 = System.nanoTime()
      val r = ImageDecode.compute(b)
      val t2 = System.nanoTime()
      sink += r.getInt(1)
      tSynth += t1 - t0
      tDec += t2 - t1
      i += 1
    }
    println(f"[webp_pred_probe] dim=$dim n=$n synth=${tSynth / 1e9}%.3f s " +
      f"decode=${tDec / 1e9}%.3f s (sink $sink)")
  }
}

/** Companion probe: the PLAIN VP8L fixture encoder, for a cost
  * baseline against the predictor/meta-Huffman one.
  */
object WebpPlainProbe {
  def main(args: Array[String]): Unit = {
    val dim = if (args.length > 0) args(0).toLong else 32L
    val n = if (args.length > 1) args(1).toInt else 4000
    var i = 0
    while (i < 3000) {
      org.apache.spark.sql.graftnative.ImageDecode.compute(
        org.apache.spark.sql.graftnative.WebpSynth.webpBytes(dim, dim, i))
      i += 1
    }
    var tSynth = 0L
    var tDec = 0L
    var sink = 0L
    i = 0
    while (i < n) {
      val t0 = System.nanoTime()
      val b = org.apache.spark.sql.graftnative.WebpSynth.webpBytes(dim, dim, i)
      val t1 = System.nanoTime()
      val r = org.apache.spark.sql.graftnative.ImageDecode.compute(b)
      val t2 = System.nanoTime()
      sink += r.getInt(1)
      tSynth += t1 - t0
      tDec += t2 - t1
      i += 1
    }
    println(f"[webp_plain_probe] dim=$dim n=$n synth=${tSynth / 1e9}%.3f s " +
      f"decode=${tDec / 1e9}%.3f s (sink $sink)")
  }
}

/** Decode-only loop over pre-built pred fixtures, for stack sampling. */
object WebpPredDecodeLoop {
  def main(args: Array[String]): Unit = {
    val dim = if (args.length > 0) args(0).toLong else 32L
    val files = Array.tabulate(256)(i =>
      org.apache.spark.sql.graftnative.WebpSynth.webpBytesPred(dim, dim, i))
    var sink = 0L
    var i = 0
    while (i < 100000000) {
      sink += org.apache.spark.sql.graftnative.ImageDecode.compute(
        files(i & 255)).getInt(1)
      i += 1
    }
    println(s"sink $sink")
  }
}
