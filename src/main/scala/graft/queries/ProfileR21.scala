package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-21 dev-loop decomposition harness (guide §1: measure first) — the
  * ProfileR20 stance: labeled sub-chain timings with the bench's own
  * methodology (min-of-3 warm noop-sink writes) so each stage's marginal
  * cost is the difference between adjacent rows, PLUS (r20 verdict item 4)
  * formatted-plan dumps of the PRE-CHECKPOINT stage frames of the
  * checkpointed chains — the subtrees the registry-level `Plans` dump
  * hides behind `Scan ExistingRDD`. Asserts nothing, feeds no artifact;
  * delete-safe.
  *
  * Usage: `runMain graft.queries.ProfileR21 [sfDir] [plansOutDir]` — when
  * plansOutDir is given, stage-frame plans land there as
  * `<name>_stage.txt`. */
object ProfileR21 {
  private def time(spark: SparkSession, label: String)(f: => DataFrame): Unit = {
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[prof] $label%-44s min ${ts.min}%.2f  (${ts.map(t => f"$t%.2f").mkString(" ")})")
  }

  private def dumpPlan(outDir: Option[String], name: String, df: DataFrame): Unit =
    outDir.foreach { dir =>
      val s = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, s"$name.txt"),
        s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[prof] wrote $dir/$name.txt")
    }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val plansDir = args.drop(1).headOption
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder().withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("OFF")
    val docs = graft.Tables.documents(spark, sfDir)
    try graft.SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    // ---- the erep fusion: old two-exchange shape vs new one-window shape
    def qual = TextQueries.qualityGateOf(
        docs.withColumn("n_tok", size(split(trim(col("text")), "\\s+")).cast("long")),
        keep = Seq("source", "n_tok", "text"))
      .filter(col("pass") === 1)
      .select("doc_id", "source", "text", "n_tok")
    val q = qual.localCheckpoint(false)
    def oldReps = { // exactReps: repartition(h, len) + groupBy (the r20 shape)
      q.withColumn("__h", xxhash64(col("text")))
        .withColumn("__len", length(col("text")))
        .repartition(col("__h"), col("__len"))
        .groupBy("__h", "__len", "text")
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
        .select(col("keep_id").as("doc_id"), col("text"))
    }
    def oldDocExactRep = { // the removed docExactRep window
      import org.apache.spark.sql.expressions.Window
      q.withColumn("__h", xxhash64(col("text")))
        .withColumn("__len", length(col("text")))
        .repartition(col("__h"), col("__len"))
        .select(col("doc_id"),
          min("doc_id").over(Window.partitionBy("__h", "__len", "text")).as("e_rep"))
    }
    time(spark, "erep.old.a exactReps (repart+groupBy)")(oldReps)
    time(spark, "erep.old.b docExactRep (repart+window)")(oldDocExactRep)
    def newErep = TextQueries.erepFrameOf(q)
    time(spark, "erep.new erepFrameOf (ONE repart+window)")(newErep)
    dumpPlan(plansDir, "x134_stage_erep_after", newErep)
    dumpPlan(plansDir, "x134_stage_exactreps_before", oldReps)
    dumpPlan(plansDir, "x134_stage_docexactrep_before", oldDocExactRep)

    // ---- x134 stage frames (pre-checkpoint plans + timings)
    dumpPlan(plansDir, "x134_stage_qual", qual)
    val erepC = TextQueries.erepFrameOf(q).localCheckpoint(false)
    def sigs = erepC.filter(col("doc_id") === col("e_rep"))
      .select(col("doc_id"), expr("graft_shingles(rep_text, 3)").as("sh"))
      .withColumn("sig", expr("graft_minhash(sh, 32)"))
    time(spark, "x134 sigs from erep ckpt")(sigs)
    dumpPlan(plansDir, "x134_stage_sigs", sigs)
    val sg = sigs.localCheckpoint(false)
    def pairs = TextQueries.minhashPairs(sg).select("doc_a", "doc_b")
    time(spark, "x134 pairs (ckpt sigs)")(pairs)
    dumpPlan(plansDir, "x134_stage_pairs", pairs)
    val pr = pairs.localCheckpoint(false)
    def labels = TextQueries.connectedReps(sg.select("doc_id"), pr)
    time(spark, "x134 CC labels (ckpt pairs)")(labels)
    dumpPlan(plansDir, "x134_stage_labels", labels)
    val lb = labels.localCheckpoint(false)
    def chain = erepC.select("doc_id", "e_rep")
      .join(lb.withColumnRenamed("doc_id", "e_rep"), Seq("e_rep"))
      .select("doc_id", "rep")
    time(spark, "x134 chain join (ckpt labels)")(chain)
    dumpPlan(plansDir, "x134_stage_chain", chain)
    time(spark, "x134 FULL")(TextQueries.releasePackBridgeOf(docs))

    // ---- x131: current shape vs gate-carry shape (guide §2.4/§3)
    def x131v(j: DataFrame): DataFrame = {
      val v = j.groupBy("lm_score").agg(
        count(lit(1)).as("cnt"), sum("pass").cast("long").as("pos"))
        .localCheckpoint(false)
      graft.ml.StatTests.withValueRanks(
        v.select("lm_score", "cnt"), "lm_score", "cnt") { ranks =>
        ranks.join(v.select("lm_score", "pos"), Seq("lm_score"))
          .agg(
            sum(col("pos") * (lit(2L) * (col("rank_offset") + col("cum_before"))
              + col("cnt") + lit(1L))).as("rank2"),
            sum("pos").as("n_pos"),
            (sum("cnt") - sum("pos")).as("n_neg"))
          .select(col("n_pos"), col("n_neg"),
            (col("rank2") - col("n_pos") * (col("n_pos") + 1)).as("u2"),
            when(col("n_pos") === 0 || col("n_neg") === 0, lit(null).cast("double"))
              .otherwise((col("rank2") - col("n_pos") * (col("n_pos") + 1)).cast("double")
                / (lit(2.0) * col("n_pos") * col("n_neg"))).as("auc"))
      }
    }
    def jJoin = TextQueries.lmScoreOf(docs).select("doc_id", "lm_score")
      .join(TextQueries.qualityGateOf(docs).select("doc_id", "pass"), Seq("doc_id"))
    def jCarry = TextQueries.lmScoreCore(
        TextQueries.qualityGateOf(docs, keep = Seq("text")).select("doc_id", "pass", "text"),
        Seq("pass"))
      .select(col("doc_id"),
        (col("sum_f").cast("double") / col("n_trans") / lit(1e6)).as("lm_score"),
        col("pass"))
    time(spark, "x131.a j via doc_id join (current)")(jJoin)
    time(spark, "x131.b j via gate carry")(jCarry)
    time(spark, "x131.a FULL (join)")(x131v(jJoin))
    time(spark, "x131.b FULL (carry)")(x131v(jCarry))
    dumpPlan(plansDir, "x131_stage_j_join", jJoin)
    dumpPlan(plansDir, "x131_stage_j_carry", jCarry)

    // ---- x136 seeds stage frame (pre-checkpoint; the r20 verdict item 4 case)
    {
      val isTrain = substring(md5(col("doc_id").cast("string")), 1, 1) <= "d"
      def seedsOld = {
        val grams = TextQueries.fiveGramsOf(docs)
          .withColumn("split", when(isTrain, "train").otherwise("test"))
        val trainG = grams.filter(col("split") === "train")
          .select(col("doc_id").as("train_id"), col("g"))
        val testG = grams.filter(col("split") === "test")
          .select(col("doc_id").as("test_id"), col("g"))
        trainG.join(broadcast(testG), "g")
          .groupBy("train_id")
          .agg(countDistinct("test_id").as("n_eval_docs"), count(lit(1)).as("n_shared"))
      }
      def seedsNew = {
        val testG = TextQueries.fiveGramsOf(docs.filter(!isTrain))
          .select(col("doc_id").as("test_id"), col("g"))
        val trainHits = TextQueries.rawFiveGramsOf(docs.filter(isTrain))
          .join(broadcast(testG.select("g").distinct()), Seq("g"), "left_semi")
          .select(col("doc_id").as("train_id"), col("g"))
          .distinct()
        trainHits.join(broadcast(testG), "g")
          .groupBy("train_id")
          .agg(countDistinct("test_id").as("n_eval_docs"), count(lit(1)).as("n_shared"))
      }
      time(spark, "x136 seeds OLD (corpus distinct)")(seedsOld)
      time(spark, "x136 seeds NEW (semi before distinct)")(seedsNew)
      dumpPlan(plansDir, "x136_stage_seeds_before", seedsOld)
      dumpPlan(plansDir, "x136_stage_seeds_after", seedsNew)
    }

    // ---- x155 hits: shared-distinct + gram-grain base join (old) vs
    //      raw-stream probe + hits-grain attach (new)
    {
      val base = docs.select(col("doc_id"), col("source"),
        when(substring(md5(col("doc_id").cast("string")), 1, 1) <= "d", "train")
          .otherwise("test").as("split"),
        when(substring(md5(col("doc_id").cast("string")), 2, 1) <= "4", "suiteA")
          .when(substring(md5(col("doc_id").cast("string")), 2, 1) <= "9", "suiteB")
          .otherwise("suiteC").as("suite"),
        col("text"))
      def hitsOld = {
        val grams = TextQueries.fiveGramsOf(base.select("doc_id", "text"))
          .join(base.select("doc_id", "source", "split", "suite"), Seq("doc_id"))
        grams.filter(col("split") === "train")
          .select(col("doc_id"), col("source"), col("g"))
          .join(TextQueries.guardedBroadcast(grams.filter(col("split") === "test")
            .select(col("g"), col("suite")).distinct()), Seq("g"))
          .select("doc_id", "source", "suite").distinct()
      }
      def hitsNew = TextQueries.rawFiveGramsOf(base.filter(col("split") === "train")
          .select("doc_id", "text"))
        .join(TextQueries.guardedBroadcast(
          TextQueries.rawFiveGramsOf(base.filter(col("split") === "test")
              .select("doc_id", "suite", "text"), carry = Seq("suite"))
            .select(col("g"), col("suite")).distinct()), Seq("g"))
        .select("doc_id", "suite").distinct()
        .join(base.select("doc_id", "source"), Seq("doc_id"))
        .select("doc_id", "source", "suite")
      time(spark, "x155 hits OLD (distinct + base join)")(hitsOld)
      time(spark, "x155 hits NEW (raw probe + late attach)")(hitsNew)
      dumpPlan(plansDir, "x155_stage_hits_before", hitsOld)
      dumpPlan(plansDir, "x155_stage_hits_after", hitsNew)
    }

    // ---- x118/x119 (r20 verdict item 6): is the tiny rollup recomputed
    //      for its own grand total (the crossJoin(broadcast(g.agg)) shape),
    //      or does AQE stage reuse already dedupe it? A/B: as-is vs a
    //      GC-scoped checkpoint pin on the ≤16/21-row rollup.
    {
      // manifestPlan(KeepMinId) reproduced from its public pieces
      def manifest = {
        val qual = docs
          .filter(size(split(trim(col("text")), "\\s+")) >= 40)
          .select("doc_id", "text")
        val chain = TextQueries.chainOf(qual)
        val man = chain.groupBy(col("rep").as("cluster_rep"))
          .agg(count(lit(1)).as("n_docs"))
          .withColumn("keep_id", col("cluster_rep"))
        val h1 = substring(col("k"), 1, 1)
        man.withColumn("k", md5(col("cluster_rep").cast("string")))
          .withColumn("split",
            when(h1 <= "b", "train").when(h1 <= "d", "val").otherwise("test"))
          .withColumn("shard",
            (instr(lit("0123456789abcdef"), substring(col("k"), 2, 1)) - 1).cast("int"))
      }
      val nTok = size(split(trim(col("text")), "\\s+")).cast("long")
      def g118 = manifest
        .select("keep_id", "n_docs", "shard")
        .join(docs.select(col("doc_id").as("keep_id"), nTok.as("n_tok")), Seq("keep_id"))
        .groupBy("shard").agg(
          count(lit(1)).as("n_clusters"),
          sum("n_docs").as("n_docs_rep"),
          sum("n_tok").as("n_tokens"))
      def x118Of(g: DataFrame) = g
        .crossJoin(broadcast(g.agg(sum("n_tokens").as("tot"))))
        .select(col("shard"), col("n_clusters"), col("n_docs_rep"), col("n_tokens"),
          expr("(n_tokens * 1000000) div tot").as("tok_share_ppm"),
          expr("(n_tokens * 16000000) div tot - 1000000").as("dev_ppm"))
        .orderBy("shard")
      time(spark, "x118 as-is (rollup recompute?)")(x118Of(g118))
      time(spark, "x118 rollup ckpt-pinned")(x118Of(g118.localCheckpoint(false)))
      dumpPlan(plansDir, "x118_stage_asis", x118Of(g118))
    }

    // ---- x137: 4-column carry through the bigram exchanges vs doc-keyed
    //      attach after the rollup (§2.3 — the carry rides EVERY bigram row)
    {
      def flags = TextQueries.qualityGateOf(
        docs.withColumn("n_tok", size(split(trim(col("text")), "\\s+")).cast("long")),
        keep = Seq("lang", "source", "n_tok", "text"))
        .select("doc_id", "lang", "source", "n_tok", "text", "pass")
      def scoCarry = TextQueries.lmScoreCore(flags, Seq("lang", "source", "n_tok", "pass"))
        .withColumn("score_ppm", expr("sum_f div n_trans"))
      def scoJoin = TextQueries.lmScoreCore(docs, Nil)
        .join(flags.select("doc_id", "lang", "source", "n_tok", "pass"), Seq("doc_id"))
        .withColumn("score_ppm", expr("sum_f div n_trans"))
      time(spark, "x137 sco CARRY (4 cols on bigrams)")(scoCarry)
      time(spark, "x137 sco JOIN (doc-keyed attach)")(scoJoin)
      dumpPlan(plansDir, "x137_stage_sco_carry", scoCarry)
      dumpPlan(plansDir, "x137_stage_sco_join", scoJoin)
    }

    // ---- x125: per-position STRING gram probe vs token-ARRAY probe
    //      (build the string only for hits)
    {
      val L = 2048
      val h1 = substring(md5(col("doc_id").cast("string")), 1, 1)
      def evalToks = docs.filter(h1 > "d")
        .withColumn("t", split(trim(col("text")), "\\s+"))
        .filter(size(col("t")) >= 5)
        .withColumn("i", explode(sequence(lit(0), size(col("t")) - 5)))
      def dd125 = docs.filter(h1 <= "d")
        .select(col("source"), col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
        .withColumn("n_tok", size(col("toks")).cast("long"))
      def packs = graft.operators.PrefixQuota.runningBefore(
        dd125, "source",
        orderKey = md5(col("doc_id").cast("string")), tie = col("doc_id"),
        value = col("n_tok"))
        .withColumn("pack_id",
          explode(sequence(expr(s"cum_before div $L"),
            expr(s"(cum_before + n_tok - 1) div $L"))))
        .withColumn("span_start",
          greatest(col("cum_before"), col("pack_id") * L) - col("pack_id") * L)
        .withColumn("doc_off",
          greatest(col("cum_before"), col("pack_id") * L) - col("cum_before"))
        .withColumn("span_len",
          least(col("cum_before") + col("n_tok"), (col("pack_id") + 1) * L)
            - greatest(col("cum_before"), col("pack_id") * L))
        .select(col("source"), col("pack_id"), col("span_start"),
          expr("slice(toks, CAST(doc_off + 1 AS INT), CAST(span_len AS INT))")
            .as("span_toks"))
        .groupBy("source", "pack_id")
        .agg(expr("array_sort(collect_list(struct(span_start, span_toks)))").as("sp"))
        .select(col("source"), col("pack_id"),
          expr("flatten(transform(sp, x -> x.span_toks))").as("body"),
          expr("filter(transform(sp, x -> x.span_start), b -> b > 0)").as("bnds"))
      def viaString = {
        val evalGrams = evalToks
          .select(array_join(expr("slice(t, i + 1, 5)"), " ").as("g")).distinct()
        packs.filter(size(col("body")) >= 5)
          .withColumn("i", explode(sequence(lit(0), size(col("body")) - 5)))
          .select(col("source"), col("pack_id"),
            array_join(expr("slice(body, i + 1, 5)"), " ").as("g"),
            expr("exists(bnds, b -> b > i AND b <= i + 4)").as("crossing"))
          .join(broadcast(evalGrams), "g")
          .groupBy("source", "pack_id")
          .agg(count(lit(1)).as("n_hits"),
            sum(when(col("crossing"), 1L).otherwise(0L)).as("n_boundary_hits"),
            min("g").as("sample_gram"))
      }
      def viaArray = {
        val evalArr = evalToks
          .select(expr("slice(t, i + 1, 5)").as("garr")).distinct()
        packs.filter(size(col("body")) >= 5)
          .withColumn("i", explode(sequence(lit(0), size(col("body")) - 5)))
          .select(col("source"), col("pack_id"),
            expr("slice(body, i + 1, 5)").as("garr"),
            expr("exists(bnds, b -> b > i AND b <= i + 4)").as("crossing"))
          .join(broadcast(evalArr), "garr")
          .groupBy("source", "pack_id")
          .agg(count(lit(1)).as("n_hits"),
            sum(when(col("crossing"), 1L).otherwise(0L)).as("n_boundary_hits"),
            min(array_join(col("garr"), " ")).as("sample_gram"))
      }
      time(spark, "x125 probe on STRING grams (current)")(viaString)
      time(spark, "x125 probe on token ARRAYS")(viaArray)
      dumpPlan(plansDir, "x125_stage_probe_string", viaString)
      dumpPlan(plansDir, "x125_stage_probe_array", viaArray)
    }

    // ---- the other lmScoreCore carries (x135 lang, x139 source,
    //      x141 source+n_tok): carry vs doc-keyed attach
    {
      def sco135c = TextQueries.lmScoreCore(docs, Seq("lang"))
        .withColumn("score_ppm", expr("sum_f div n_trans"))
      def sco135j = TextQueries.lmScoreCore(docs, Nil)
        .join(docs.select("doc_id", "lang"), Seq("doc_id"))
        .withColumn("score_ppm", expr("sum_f div n_trans"))
      time(spark, "x135 sco CARRY (lang)")(sco135c)
      time(spark, "x135 sco JOIN")(sco135j)
      def sco139c = TextQueries.lmScoreCore(docs, Seq("source"))
        .withColumn("score_ppm", expr("sum_f div n_trans"))
        .groupBy("source", "score_ppm").agg(count(lit(1)).as("n"))
      def sco139j = TextQueries.lmScoreCore(docs, Nil)
        .join(docs.select("doc_id", "source"), Seq("doc_id"))
        .withColumn("score_ppm", expr("sum_f div n_trans"))
        .groupBy("source", "score_ppm").agg(count(lit(1)).as("n"))
      time(spark, "x139 sc CARRY (source)")(sco139c)
      time(spark, "x139 sc JOIN")(sco139j)
      def sco141c = TextQueries.lmScoreCore(
          docs.withColumn("n_tok", size(split(trim(col("text")), "\\s+")).cast("long")),
          Seq("source", "n_tok"))
        .withColumn("score_ppm", expr("sum_f div n_trans"))
      def sco141j = TextQueries.lmScoreCore(docs, Nil)
        .join(docs.select(col("doc_id"), col("source"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok")), Seq("doc_id"))
        .withColumn("score_ppm", expr("sum_f div n_trans"))
      time(spark, "x141 sco CARRY (source+n_tok)")(sco141c)
      time(spark, "x141 sco JOIN")(sco141j)
    }

    spark.stop()
  }
}
