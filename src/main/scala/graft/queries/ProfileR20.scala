package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-20 dev-loop decomposition harness (guide §1: measure first) —
  * times labeled SUB-CHAINS of the bench's most expensive queries with the
  * bench's own methodology (min-of-3 warm noop-sink writes), so the
  * marginal cost of each stage is the difference between adjacent rows.
  * Private-helper stages are reproduced inline from their public pieces
  * where the original is private; this file asserts nothing and feeds no
  * artifact — it exists to aim the optimization knife. Delete-safe. */
object ProfileR20 {
  private def time(spark: SparkSession, label: String)(f: => DataFrame): Unit = {
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[prof] $label%-40s min ${ts.min}%.2f  (${ts.map(t => f"$t%.2f").mkString(" ")})")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder().withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("OFF")
    val docs = graft.Tables.documents(spark, sfDir)
    // warm-up
    try graft.SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    // ---- x134 decomposition ----
    def qual = TextQueries.qualityGateOf(
        docs.withColumn("n_tok", size(split(trim(col("text")), "\\s+")).cast("long")),
        keep = Seq("source", "n_tok", "text"))
      .filter(col("pass") === 1)
      .select("doc_id", "source", "text", "n_tok")
    time(spark, "x134.1 qual (gate+filter)")(qual)
    def sigs = TextQueries.minhashSignaturesOf(qual)
    time(spark, "x134.2 sigs (exactReps+minhash)")(sigs)
    time(spark, "x134.3 pairs (band+verify)")(TextQueries.minhashPairs(sigs.localCheckpoint(false)))
    val q = qual.localCheckpoint(false)
    val sg = TextQueries.minhashSignaturesOf(q).localCheckpoint(false)
    val pr = TextQueries.minhashPairs(sg).select("doc_a", "doc_b").localCheckpoint(false)
    time(spark, "x134.4 CC labels (chain ckpted)")(
      TextQueries.connectedReps(sg.select("doc_id"), pr))
    val labels = TextQueries.connectedReps(sg.select("doc_id"), pr).localCheckpoint(false)
    // docExactRep is private: reproduce (hash+len repartition + min window)
    def dExact = {
      import org.apache.spark.sql.expressions.Window
      q.withColumn("__h", xxhash64(col("text")))
        .withColumn("__len", length(col("text")))
        .repartition(col("__h"), col("__len"))
        .select(col("doc_id"),
          min("doc_id").over(Window.partitionBy("__h", "__len", "text")).as("e_rep"))
    }
    time(spark, "x134.5 docExactRep")(dExact)
    def chain = dExact.join(labels.withColumnRenamed("doc_id", "e_rep"), Seq("e_rep"))
      .select("doc_id", "rep")
    def sv = chain.select(col("rep").as("keep_id")).distinct()
      .join(q.select(col("doc_id").as("keep_id"), col("source"), col("n_tok")), Seq("keep_id"))
    time(spark, "x134.6 sv (survivors)")(sv)
    val svC = sv.localCheckpoint(false)
    val per = svC.groupBy("source").agg(sum("n_tok").as("m"))
    val tot = per.agg(expr("sum(m) div 2").as("budget"),
      aggregate(array_sort(collect_list(sqrt(col("m").cast("double")))),
        lit(0.0), (a, x) => a + x).as("sum_sqrt"))
    val quo = per.crossJoin(broadcast(tot))
      .select(col("source"),
        floor(col("budget") * sqrt(col("m").cast("double")) / col("sum_sqrt"))
          .cast("long").as("quota_tokens"))
    val svq = svC.join(broadcast(quo), Seq("source")).localCheckpoint(false)
    time(spark, "x134.7 quota attach (from svC)")(svq)
    def kept = graft.operators.PrefixQuota.takeUntilQuota(
      svq, "source", orderKey = md5(col("keep_id").cast("string")), tie = col("keep_id"),
      value = col("n_tok"), quota = col("quota_tokens"))
    time(spark, "x134.8 PrefixQuota (from svq)")(kept)
    val L = 2048
    time(spark, "x134.9 pack rollup (from svq)")(
      kept
        .withColumn("pack_id",
          explode(sequence(expr(s"cum_before div $L"),
            expr(s"(cum_before + n_tok - 1) div $L"))))
        .withColumn("span_len",
          least(col("cum_before") + col("n_tok"), (col("pack_id") + 1) * L)
            - greatest(col("cum_before"), col("pack_id") * L))
        .groupBy("source", "pack_id", "quota_tokens")
        .agg(count(lit(1)).as("n_spans"), sum("span_len").as("n_tokens"))
        .select("source", "pack_id", "quota_tokens", "n_spans", "n_tokens")
        .orderBy("source", "pack_id"))
    time(spark, "x134 FULL")(TextQueries.releasePackBridgeOf(docs))

    // ---- gate variants: where do x134.1's 2.7 s go? ----
    time(spark, "gate.a x64 shape (no filter)")(TextQueries.qualityGateOf(docs))
    time(spark, "gate.b gate+filter(pass=1), all cols")(
      TextQueries.qualityGateOf(docs).filter(col("pass") === 1))
    time(spark, "gate.c gate+filter, sel id only")(
      TextQueries.qualityGateOf(docs, keep = Seq("source", "text"))
        .filter(col("pass") === 1).select("doc_id", "source", "text"))
    time(spark, "gate.d n_tok regex split alone")(
      docs.select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok")))
    time(spark, "gate.e x134 qual exact shape")(qual)
    // HOF suspects in isolation
    time(spark, "gate.f dup_bigram HOF alone")(
      docs.select(col("doc_id"),
        size(array_distinct(expr(
          "transform(sequence(1, size(split(text, ' ')) - 1), i -> concat(element_at(split(text, ' '), i), ' ', element_at(split(text, ' '), i + 1)))"))).as("db")))
    time(spark, "gate.g split+aggregate wlen alone")(
      docs.select(col("doc_id"),
        expr("aggregate(split(text, ' '), 0L, (a, t) -> a + length(t))").as("s")))
    time(spark, "gate.h stop_hits filter alone")(
      docs.select(col("doc_id"),
        size(filter(split(col("text"), " "), t => t === "the" || t === "a")).as("sh")))

    // ---- raw dedup chain (x26/x51/x58/x59/x104/x125/x136/x147/x156) ----
    time(spark, "chain.1 exactReps (x01 shape)")(
      TextQueries.dedupExact.run(spark, sfDir))
    def rsigs = TextQueries.minhashSignaturesOf(docs)
    time(spark, "chain.2 sigs raw")(rsigs)
    val rsC = rsigs.localCheckpoint(false)
    time(spark, "chain.3 bandCandidates (ckpt sigs)")(TextQueries.bandCandidates(rsC))
    time(spark, "chain.4 pairs verify (ckpt sigs)")(TextQueries.minhashPairs(rsC))
    val rpC = TextQueries.minhashPairs(rsC).select("doc_a", "doc_b").localCheckpoint(false)
    time(spark, "chain.5 CC (ckpt pairs)")(
      TextQueries.connectedReps(rsC.select("doc_id"), rpC))
    time(spark, "x26 FULL")(TextQueries.dedupClusters.run(spark, sfDir))
    time(spark, "x58 FULL")(graft.SparkEntry.defs.find(_.name.startsWith("x58")).get.run(spark, sfDir))
    time(spark, "x104 FULL")(graft.SparkEntry.defs.find(_.name.startsWith("x104")).get.run(spark, sfDir))
    time(spark, "x156 FULL")(graft.SparkEntry.defs.find(_.name.startsWith("x156")).get.run(spark, sfDir))
    time(spark, "x125 FULL")(graft.SparkEntry.defs.find(_.name.startsWith("x125")).get.run(spark, sfDir))
    time(spark, "x136 FULL")(graft.SparkEntry.defs.find(_.name.startsWith("x136")).get.run(spark, sfDir))
    time(spark, "x61 FULL")(graft.SparkEntry.defs.find(_.name.startsWith("x61")).get.run(spark, sfDir))
    time(spark, "x73 FULL")(graft.SparkEntry.defs.find(_.name.startsWith("x73")).get.run(spark, sfDir))
    time(spark, "x68 FULL")(graft.SparkEntry.defs.find(_.name.startsWith("x68")).get.run(spark, sfDir))
    time(spark, "x48 FULL")(graft.SparkEntry.defs.find(_.name.startsWith("x48")).get.run(spark, sfDir))

    // ---- x61 decomposition ----
    {
      val base = docs.select(col("doc_id"), col("text"))
      def toks = base
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("p0", "tk")))
        .select(col("doc_id"), (col("p0") + 1).as("pos"), col("tk"))
      def wins = base
        .select(col("doc_id"), size(split(col("text"), " ")).as("n"),
          posexplode(expr("graft_shingle_pos(text, 8)")).as(Seq("k0", "h")))
      time(spark, "x61.1 wins explode")(wins)
      def owners = wins.groupBy("h").agg(min("doc_id").as("owner"))
      time(spark, "x61.2 owners")(owners)
      def cut = wins.join(owners, Seq("h"))
        .filter(col("owner") < col("doc_id"))
        .select(col("doc_id"),
          explode(sequence(col("k0") + 1, least(col("k0") + lit(8), col("n")))).as("p"))
        .distinct()
      time(spark, "x61.3 cut positions (distinct)")(cut)
      val cutC = cut.localCheckpoint(false)
      def kept = toks.join(cutC,
        toks("doc_id") === cutC("doc_id") && toks("pos") === cutC("p"), "left_anti")
      time(spark, "x61.4 anti-join kept (ckpt cut)")(kept)
      time(spark, "x61.5 reassemble (ckpt cut)")(
        kept.groupBy("doc_id").agg(
          count(lit(1)).as("n_kept"),
          expr("array_join(transform(array_sort(collect_list(struct(pos, tk))), s -> s.tk), ' ')")
            .as("kept_text")))
    }

    // ---- x34 decomposition ----
    val orders = graft.Tables.orders(spark, sfDir)
    time(spark, "x34 FULL (profile exact)")(
      graft.operators.Profiler.profile(orders, exactHint = Some(true))
        .select(col("column").as("col_name"), col("n_nulls"), col("n_distinct"))
        .orderBy("col_name"))
    // same aggregate WITHOUT min/max — does dropping them restore hash agg?
    val aggs = orders.columns.toSeq.flatMap { c =>
      Seq(coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"))
    }
    time(spark, "x34 alt: no min/max aggregates")(
      orders.agg(aggs.head, aggs.tail: _*))
    spark.stop()
  }
}
