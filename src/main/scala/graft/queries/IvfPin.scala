package graft.queries

import org.apache.spark.sql.SparkSession

/** Regenerates [[IvfPinned]] from a corpus directory: trains the seeded
  * KMeans once and writes the centroids as Scala source literals
  * (`Double.toString` round-trips bit-exactly through the Scala parser).
  * Usage: `sbt "runMain graft.queries.IvfPin [sfDir] [outFile]"`. */
object IvfPin {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = if (args.length > 1) args(1)
      else "src/main/scala/graft/queries/IvfPinned.scala"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cs = SimilarityQueries.trainIvf(graft.Tables.embeddings(spark, dir), nCells = 16)
    spark.stop()
    val existing = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(out)), "UTF-8")
    val header = existing.substring(0, existing.indexOf("val centroids"))
    val body = cs.map(_.mkString("    Vector(", ", ", ")")).mkString(",\n")
    val src = header + "val centroids: Seq[Seq[Double]] = Vector(\n" + body + ")\n}\n"
    java.nio.file.Files.write(java.nio.file.Paths.get(out), src.getBytes("UTF-8"))
    println(s"pinned ${cs.size} centroids from $dir into $out")
  }
}
