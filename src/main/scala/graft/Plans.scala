package graft
import org.apache.spark.sql.SparkSession

object Plans {
  def main(args: Array[String]): Unit = {
    if (args.nonEmpty && args(0) == "codec") { codecBench(); return }
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.01"
    for (q <- args) {
      println(s"========== $q ==========")
      println(Queries.all(q)(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }

  /** Single-thread codec throughput: the reference's headline metric is
    * 100+ MB/s per partition (BASELINE.md) — one partition = one thread here.
    */
  def codecBench(): Unit = {
    import graft.codec._
    import graft.model.KRecord
    val rnd = new scala.util.Random(42)
    // ~128 MB of 1 KB json-ish values (compressible, like typical payloads)
    val words = Array("alpha","bravo","charlie","delta","echo","foxtrot","golf","hotel")
    def mkValue(i: Int): Array[Byte] = {
      val sb = new StringBuilder(1024)
      sb.append("{\"id\":").append(i)
      while (sb.length < 1000) sb.append(",\"").append(words(rnd.nextInt(8))).append("\":\"").append(words(rnd.nextInt(8))).append(rnd.nextInt(100)).append("\"")
      sb.append("}")
      sb.toString.getBytes
    }
    val n = 131072
    val records = (0 until n).map(i => KRecord("t", 0, i.toLong, 1700000000000L + i,
      s"key-$i".getBytes, mkValue(i), Nil)).toArray
    val totalBytes = records.map(r => r.key.length + r.value.length + 20L).sum
    println(f"payload: ${totalBytes / 1e6}%.0f MB, $n records")
    for (codec <- Seq(CompressionCodec.None, CompressionCodec.Zstd, CompressionCodec.Lz4)) {
      // warm
      SegmentCodec.encode(records.take(1000), codec)
      var t0 = System.nanoTime()
      val bytes = SegmentCodec.encode(records, codec)
      val tEnc = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val count = SegmentCodec.decode(bytes, "t", 0).size
      val tDec = (System.nanoTime() - t0) / 1e9
      println(f"$codec: encode ${totalBytes / 1e6 / tEnc}%.0f MB/s, decode ${totalBytes / 1e6 / tDec}%.0f MB/s, ratio ${totalBytes.toDouble / bytes.length}%.2f ($count records)")
    }
  }
}
