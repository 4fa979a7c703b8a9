package graft.queries

import org.apache.spark.sql.SparkSession

/** Regenerates [[PqPinned]] from a corpus directory: trains the per-subspace
  * seeded KMeans codebooks once and writes them as Scala source literals
  * (`Double.toString` round-trips bit-exactly through the Scala parser).
  * Usage: `sbt "runMain graft.queries.PqPin [sfDir] [outFile]"`. */
object PqPin {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = if (args.length > 1) args(1)
      else "src/main/scala/graft/queries/PqPinned.scala"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.{bit_xor, col, count, lit, xxhash64}
    val emb = graft.Tables.embeddings(spark, dir)
    // layout comes from the artifact itself so the trainer can't drift
    val cbs = SimilarityQueries.trainPq(emb,
      nSub = PqPinned.nSub, subDim = PqPinned.subDim, nCodes = PqPinned.nCodes)
    val fp = emb.agg(count(lit(1)), bit_xor(xxhash64(col("vec_id")))).head()
    spark.stop()
    val existing = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(out)), "UTF-8")
    val header = existing.substring(0, existing.indexOf("val corpusRows"))
    val body = cbs.map(_.map(_.mkString("      Vector(", ", ", ")"))
      .mkString("    Vector(\n", ",\n", ")")).mkString(",\n")
    val src = header +
      s"val corpusRows: Long = ${fp.getLong(0)}L\n" +
      s"  val corpusIdXor: Long = ${fp.getLong(1)}L\n" +
      "  /** codebooks(s)(c) = the c-th centroid of subspace s (subDim doubles). */\n" +
      "  val codebooks: Seq[Seq[Seq[Double]]] = Vector(\n" + body + ")\n}\n"
    java.nio.file.Files.write(java.nio.file.Paths.get(out), src.getBytes("UTF-8"))
    println(s"pinned ${cbs.size}x${PqPinned.nCodes} sub-centroids + corpus " +
      s"fingerprint (${fp.getLong(0)} rows) from $dir into $out")
  }
}
