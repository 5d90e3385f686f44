package graft

import org.apache.spark.sql.graftnative.{Bzip2Codec, WikiSynth}

/** Dev probe: driver-side cost split of the wiki_dump_bz2 lane —
  * synth vs compress vs decompress, isolated from Spark execution.
  */
object BzProbe {
  def main(args: Array[String]): Unit = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val n = if (args.nonEmpty) args(0).toLong else 5000L
    (0L until 200L).foreach { d =>
      Bzip2Codec.decompress(Bzip2Codec.compress(WikiSynth.dumpXml(d).getBytes(utf8)))
    }
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[bzprobe] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val docs = 0L until n
    val xmls = docs.map(d => WikiSynth.dumpXml(d).getBytes(utf8)).toArray
    println(s"[bzprobe] avg xml bytes: ${xmls.map(_.length).sum / xmls.length}")
    time("synth xml")(docs.foreach(d => WikiSynth.dumpXml(d)))
    var compressed: Array[Array[Byte]] = null
    time("compress") { compressed = xmls.map(Bzip2Codec.compress) }
    println(s"[bzprobe] avg bz2 bytes: ${compressed.map(_.length).sum / compressed.length}")
    time("decompress")(compressed.foreach(Bzip2Codec.decompress))
    time("roundtrip x2") {
      xmls.foreach(x => Bzip2Codec.decompress(Bzip2Codec.compress(x)))
      xmls.foreach(x => Bzip2Codec.decompress(Bzip2Codec.compress(x)))
    }
  }
}
