package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions
import graft.operators.{Dedup, Similarity}
import graft.queries.TrainingShared._

/** Training-data pipeline operators: entity resolution, curation pipelines and the remaining eval/selection families (fourth quarter of the Training inventory). Query/oracle pairs stay in
  * the same file so engine and oracle change together.
  */
private[queries] object TrainingD {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Sequence-packing efficiency audit — the pretraining-loader
    // readout for GPT-style concat-and-chunk packing: stream documents
    // in a fixed order into context windows of length L and measure
    // what the loader actually pays — how many documents get SPLIT
    // across a window boundary (their loss is degraded by truncated
    // context) and how much tail padding the last window wastes, for
    // each candidate L. A doc spanning [start, end) in the token
    // stream crosses floor((end−1)/L) − floor(start/L) boundaries —
    // pure integer arithmetic off ONE global prefix sum of token
    // counts (PrefixScan; a window cumsum here would be the q71
    // single-task funnel). Scale shape: one scan + one range-sorted
    // prefix scan, then a 2-row L-grid broadcast and a bounded
    // aggregate; nothing quadratic, nothing driver-side.
    "q408_packing_efficiency" -> ((s, d) => {
      val nt = t(s, d, "documents")
        .select(col("doc_id"),
          size(TextFunctions.tokens(col("text"))).cast("long").as("nt"))
        .where(col("nt") > 0L)
      val cum = graft.operators.PrefixScan.scanLong(
        nt, "cum", "nt", "sum", inclusive = true, asc("doc_id"))
      val grid = { import s.implicits._; Seq(512L, 2048L).toDF("l") }
      cum.crossJoin(broadcast(grid))
        .withColumn("crossed",
          expr("(cum - 1) div l - (cum - nt) div l"))
        .groupBy("l")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("crossed") > 0L, 1L).otherwise(0L)).as("n_split"),
          sum("crossed").as("n_crossings"),
          max("cum").as("total_tokens"))
        .select(col("l"), col("n_docs"), col("n_split"),
          expr("n_split * 1000000 div n_docs").as("split_frac_e6"),
          col("n_crossings"), col("total_tokens"),
          expr("(total_tokens + l - 1) div l").as("n_windows"),
          expr("((total_tokens + l - 1) div l) * l - total_tokens")
            .as("tail_pad_tokens"))
    }),

    // UNSUPERVISED Fellegi–Sunter parameter estimation by EM (Winkler
    // 1988; the Splink training loop) — where q387 estimated m/u from
    // labeled pairs, this recovers them from the UNLABELED candidate set:
    // collapse pairs to their 2⁴ = 16 comparison patterns, then 5 EM
    // rounds on that bounded frame. E-step: per-pattern match posterior
    // w = p·Πm / (p·Πm + (1−p)·Πu); M-step: w-weighted refits of p, m_k,
    // u_k. Every step is e6 integers with a FIXED trunc-div chain
    // (((p·f1)div 1e6·f2)div 1e6…), so the oracle replays all 5 rounds
    // bit-for-bit (int64-safe while candidate pairs ≤ 9e6 per the
    // a_k·1e6 bound; production shards the E-step by pattern — it is 16
    // rows regardless of corpus size). Scale shape: corpus-scale work is
    // the capped LSH candidate join + ONE pattern groupBy; the EM itself
    // is iteration on a 16-row localCheckpoint'd frame.
    "q398_fs_em" -> ((s, d) => {
      val docs = t(s, d, "documents").where(col("doc_id") < 300)
      val side = docs.select(col("doc_id"), col("source"), col("lang"),
        col("n_chars"),
        element_at(TextFunctions.tokens(col("text")), 1).as("tok1"))
      val pat = Dedup.lshCandidatePairs(docs, "doc_id", "text")
        .join(side.toDF("id1", "s1", "l1", "c1", "t1"), "id1")
        .join(side.toDF("id2", "s2", "l2", "c2", "t2"), "id2")
        .select((col("s1") === col("s2")).cast("long").as("x1"),
          (col("l1") === col("l2")).cast("long").as("x2"),
          (abs(col("c1") - col("c2")) < 100L).cast("long").as("x3"),
          (col("t1") === col("t2")).cast("long").as("x4"))
        .groupBy("x1", "x2", "x3", "x4").agg(count(lit(1)).as("npat"))
        .localCheckpoint(true)
      def pp(pcol: String, cs: Seq[String]): String =
        cs.zipWithIndex.foldLeft(s"$pcol") { case (acc, (c, i)) =>
          s"(($acc * (CASE WHEN x${i + 1} = 1 THEN $c " +
            s"ELSE 1000000 - $c END)) div 1000000)"
        }
      var st = t(s, d, "documents").sparkSession.range(1).select(
        lit(100000L).as("p"),
        lit(900000L).as("m1"), lit(900000L).as("m2"),
        lit(800000L).as("m3"), lit(700000L).as("m4"),
        lit(500000L).as("u1"), lit(300000L).as("u2"),
        lit(400000L).as("u3"), lit(100000L).as("u4"))
      for (_ <- 1 to 5) {
        val e = pat.crossJoin(broadcast(st))
          .withColumn("pm", expr(pp("p", Seq("m1", "m2", "m3", "m4"))))
          .withColumn("pu", expr(pp("(1000000 - p)",
            Seq("u1", "u2", "u3", "u4"))))
          .withColumn("w", expr(
            "CASE WHEN pm + pu = 0 THEN 0 " +
            "ELSE (pm * 1000000) div (pm + pu) END"))
        val fit = (1 to 4).flatMap { k =>
          Seq(
            expr(s"CASE WHEN sum(npat * w) = 0 THEN 0 ELSE " +
              s"(sum(CASE WHEN x$k = 1 THEN npat * w ELSE 0 END) * 1000000)" +
              s" div sum(npat * w) END").as(s"m$k"),
            expr(s"CASE WHEN sum(npat * (1000000 - w)) = 0 THEN 0 ELSE " +
              s"(sum(CASE WHEN x$k = 1 THEN npat * (1000000 - w) ELSE 0 END)" +
              s" * 1000000) div sum(npat * (1000000 - w)) END").as(s"u$k"))
        }
        st = e.agg(expr("sum(npat * w) div sum(npat)").as("p"),
            fit: _*)
          .localCheckpoint(true)
      }
      val np = pat.agg(sum("npat").as("n_pairs"))
      st.crossJoin(np)
        .select(expr("""stack(4,
            'source', m1, u1,
            'lang',   m2, u2,
            'len',    m3, u3,
            'tok1',   m4, u4) AS (feature, m_e6, u_e6)"""),
          col("p").as("p_e6"), col("n_pairs"))
        .withColumn("lambda_e6", expr(
          "CASE WHEN m_e6 = 0 OR u_e6 = 0 THEN 0 ELSE " +
          "CAST(floor(ln(CAST(m_e6 AS DOUBLE) / u_e6) * 1000000.0) " +
          "AS BIGINT) END"))
    }),


    // Leakage-free churn label construction — the supervised-dataset
    // generation pattern done right: features come STRICTLY from
    // [t0−56d, t0−28d) and the label (churned = zero events) from
    // [t0−28d, t0), so no feature can see the label window — the
    // time-split discipline whose absence is the classic silent
    // target-leak. t0 is the broadcast corpus max timestamp. One scan,
    // both windows aggregated per user via CASE sides; population =
    // users active in the feature window.
    "q384_churn_labels" -> ((s, d) => {
      val ev = t(s, d, "events").select(col("user_id"),
        unix_timestamp(col("ts")).as("ts_s"), col("event_type"))
      val anchor = ev.agg(max("ts_s").as("t0"))
      ev.crossJoin(broadcast(anchor))
        .withColumn("in_feat",
          col("ts_s") >= col("t0") - 4838400L && col("ts_s") < col("t0") - 2419200L)
        .withColumn("in_label", col("ts_s") >= col("t0") - 2419200L)
        .groupBy("user_id")
        .agg(sum(when(col("in_feat"), 1L).otherwise(0L)).as("n_feat_events"),
          sum(when(col("in_feat") && col("event_type") === "purchase", 1L)
            .otherwise(0L)).as("n_feat_purchases"),
          sum(when(col("in_label"), 1L).otherwise(0L)).as("n_label_events"))
        .where(col("n_feat_events") > 0L)
        .select(col("user_id"), col("n_feat_events"), col("n_feat_purchases"),
          (col("n_label_events") === 0L).as("churned"))
    }),


    // Johnson–Lindenstrauss distortion audit — measure what the
    // workhorse dimensionality reduction actually costs: project 64-d
    // vectors to 16-d with a deterministic ±1 sign matrix (signs from
    // the md5-60 hash of (dim_in, dim_out) — no stored matrix), then
    // for in-cell pairs compare projected vs original squared L2:
    // E[d²_proj] = 16·d²_orig for sign projections, so ratio_e6 =
    // d²_proj·1e6 div (16·d²_orig) concentrates at 1e6 — the histogram
    // IS the JL concentration curve. All integer: dims quantized e6,
    // distances exact BIGINT. Scale shape: projection is one map-side
    // 16×64 fold; pairs stay inside the scaled (cell, bin) groups.
    "q383_jl_distortion" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val ve = e.select(col("vec_id"), col("label"), expr(
        """transform(embedding,
             v -> cast(floor(cast(v as double) * 1000000.0) as bigint))""")
        .as("ve"))
      // signs computed ONCE here via the same md5('jl:i:j') % 2 formula
      // the oracle replays in SQL — embedding them as literal arrays
      // keeps the expression tree 16 zip_with folds instead of 1024
      // CASE(md5(...)) terms, whose per-run constant folding alone
      // measured ~7 s of plan time at sf0.1
      def jlSign(i: Int, j: Int): Long = {
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(s"jl:$i:$j".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        if (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2 == 0) 1L
        else -1L
      }
      val projExpr = (0 until 16).map { j =>
        val arr = (0 until 64).map(i => s"${jlSign(i, j)}L").mkString(", ")
        expr(s"""aggregate(zip_with(ve, array($arr),
               (v, sg) -> v * sg), 0L, (a, z) -> a + z)""").as(s"p$j")
      }
      val proj = ve.select(Seq(col("vec_id"), col("label")) ++ projExpr: _*)
      val cells = Similarity.withIvfCell(e, Similarity.ivfCentroids(e))
      val nDf = e.agg(count(lit(1)).as("n_total"))
      // q347's corpus-scaled bin over the quantized first coordinate so
      // the pair frame stays linear in n
      val a = ve.join(proj.drop("label"), "vec_id").join(cells, "vec_id")
        .crossJoin(broadcast(nDf))
        .withColumn("nb", expr("greatest(1L, n_total div 2000)"))
        .withColumn("bin", expr(
          """least(nb - 1, greatest(0L, cast(floor(
            (cast(element_at(ve, 1) as double) / 1000000.0 + 1.0)
            / 2.0 * nb) as bigint)))"""))
        .drop("n_total", "nb")
      val b = a.toDF(a.columns.map(c => s"b_$c"): _*)
      // zip_with fold, deliberately: the "optimized" flat 64-term
      // unrolled sum measured 4.5× SLOWER (26.5 s vs 5.8 s at sf0.1 —
      // a 128-element_at expression overruns the codegen method-size
      // split and degrades), while the HOF stays one generated loop
      val dOrig = expr(
        """aggregate(zip_with(ve, b_ve, (x, y) -> (x - y) * (x - y)),
             0L, (acc, z) -> acc + z)""")
      val dProj = (0 until 16)
        .map(j => expr(s"(p$j - b_p$j) * (p$j - b_p$j)"))
        .reduce(_ + _)
      a.join(b, col("cell") === col("b_cell") && col("bin") === col("b_bin") &&
          col("vec_id") < col("b_vec_id"))
        // deterministic 1-in-4 pair sample: a concentration histogram
        // needs pair VOLUME, not every pair — 4x off the dominant cost
        .where((col("vec_id") + col("b_vec_id")) % 4 === 0L)
        .select(dOrig.as("do2"), dProj.as("dp2"))
        .where(col("do2") > 0L)
        // (dp2 div 16) first: dp2·10 could pass int64; dp2 div 16 cannot
        .select(expr("(dp2 div 16) * 10 div do2").as("bkt"))
        .groupBy("bkt").agg(count(lit(1)).as("n_pairs"))
    }),


    // Binary-embedding recall audit — the 32×-memory-saving production
    // variant (sign-bit codes + Hamming ranking) measured against the
    // float-cosine truth, the q117 recall posture: 60-of-64 sign bits
    // pack into one BIGINT (staying under the sign bit, the hash60
    // convention), candidates rank by bit_count(xor), and recall@10 is
    // reported per query. Scale shape: the code is one map-side fold;
    // ranking is the broadcast-query scan with a query-keyed window —
    // and at corpus scale the 8-byte codes are what makes the scan
    // cache-resident where float vectors are not.
    "q381_binary_recall" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = t(s, d, "embeddings")
      val qids = Seq(10L, 20L, 30L)
      val coded = e.select(col("vec_id"), expr(
        """aggregate(sequence(0, 59), 0L,
             (a, i) -> a + if(cast(element_at(embedding, i + 1) as double)
                              > 0.0, shiftleft(1L, i), 0L))""").as("code"))
      val q = coded.where(col("vec_id").isin(qids: _*))
        .select(col("vec_id").as("query_id"), col("code").as("qcode"))
      val w = Window.partitionBy("query_id").orderBy(asc("ham"), asc("vec_id"))
      val hamTop = coded.crossJoin(broadcast(q))
        .where(col("vec_id") =!= col("query_id"))
        .withColumn("ham", expr("cast(bit_count(code ^ qcode) as bigint)"))
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= 10)
        .select(col("query_id"), col("vec_id").as("neighbor_id"), lit(1L).as("hit"))
      Similarity.bruteForceTopK(e, e.where(col("vec_id").isin(qids: _*)), 10)
        .select(col("query_id"), col("neighbor_id"))
        .join(hamTop, Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id")
        .agg(count(lit(1)).as("k"),
          coalesce(sum("hit"), lit(0L)).as("n_hit"))
        .select(col("query_id"), col("k"), col("n_hit"),
          expr("n_hit * 1000000 div k").as("recall_e6"))
    }),


    // Binary-candidate + float-rerank recall — the FIX q381's 10–30%
    // recall prescribes, proven (the q373 pattern): Hamming top-50 on
    // the 8-byte codes as the candidate stage, exact float cosine
    // reranks the 50 to a top-10, recall@10 vs direct brute force. The
    // production two-stage retrieval shape: the cheap scan touches
    // every code, the expensive float math touches 50 rows per query.
    "q382_binary_rerank_recall" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = t(s, d, "embeddings")
      val qids = Seq(10L, 20L, 30L)
      val coded = e.select(col("vec_id"), col("embedding"), expr(
        """aggregate(sequence(0, 59), 0L,
             (a, i) -> a + if(cast(element_at(embedding, i + 1) as double)
                              > 0.0, shiftleft(1L, i), 0L))""").as("code"))
      val q = coded.where(col("vec_id").isin(qids: _*))
        .select(col("vec_id").as("query_id"), col("code").as("qcode"),
          col("embedding").as("qemb"))
        .withColumn("qn", Similarity.norm2("qemb"))
      val wH = Window.partitionBy("query_id").orderBy(asc("ham"), asc("vec_id"))
      val cand = coded.crossJoin(broadcast(q))
        .where(col("vec_id") =!= col("query_id"))
        .withColumn("ham", expr("cast(bit_count(code ^ qcode) as bigint)"))
        .withColumn("hrnk", row_number().over(wH))
        .where(col("hrnk") <= 50)
      val wC = Window.partitionBy("query_id").orderBy(desc("cos"), asc("vec_id"))
      val reranked = cand
        .withColumn("nrm", Similarity.norm2("embedding"))
        .withColumn("cos", Similarity.cosineWithNorms(
          Similarity.dot("embedding", "qemb"), col("nrm"), col("qn")))
        .withColumn("rnk", row_number().over(wC))
        .where(col("rnk") <= 10)
        .select(col("query_id"), col("vec_id").as("neighbor_id"), lit(1L).as("hit"))
      Similarity.bruteForceTopK(e, e.where(col("vec_id").isin(qids: _*)), 10)
        .select(col("query_id"), col("neighbor_id"))
        .join(reranked, Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id")
        .agg(count(lit(1)).as("k"), coalesce(sum("hit"), lit(0L)).as("n_hit"))
        .select(col("query_id"), col("k"), col("n_hit"),
          expr("n_hit * 1000000 div k").as("recall_e6"))
    }),


    // Scrub residual verification — the q373-style prove-the-fix query
    // for q85's PII scrub: run the DETECTORS over the SCRUBBED text and
    // count residual digit runs and residual email shapes. Residual
    // digits are zero by construction (every digit run is replaced);
    // residual email patterns CAN survive (the digit pass rewrites the
    // local part, leaving letter@letter shapes the email pass then
    // catches — the audit confirms order matters and the composed
    // pipeline ends clean). One map pass + one global aggregate.
    "q380_scrub_residual" -> ((s, d) => {
      val scrubbed = regexp_replace(
        regexp_replace(col("text"), "[0-9]+", "<NUM>"),
        "[a-zA-Z0-9.]+@[a-zA-Z0-9.]+", "<EMAIL>")
      t(s, d, "documents")
        .select((scrubbed =!= col("text")).as("changed"),
          scrubbed.rlike("[0-9]").as("res_digit"),
          scrubbed.rlike("[a-zA-Z0-9.]+@[a-zA-Z0-9.]+").as("res_email"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("changed"), 1L).otherwise(0L)).as("n_changed"),
          sum(when(col("res_digit"), 1L).otherwise(0L)).as("n_residual_digits"),
          sum(when(col("res_email"), 1L).otherwise(0L)).as("n_residual_emails"))
    }),


    // Fusion provenance report — the IR diagnostic behind q350's RRF:
    // for each query's fused top-10, how many results came from the
    // dense list only, the sparse list only, or both — the readout
    // that tells you which retriever actually drives the ranking (a
    // fusion where one side never contributes is dead weight). One
    // bounded aggregate over the fused frame.
    "q378_fusion_provenance" -> ((s, d) => {
      Training.queries("q350_rrf_fusion")(s, d)
        .groupBy("query_id")
        .agg(count(lit(1)).as("n"),
          sum(when(col("r_dense").isNotNull && col("r_sparse").isNull, 1L)
            .otherwise(0L)).as("dense_only"),
          sum(when(col("r_dense").isNull && col("r_sparse").isNotNull, 1L)
            .otherwise(0L)).as("sparse_only"),
          sum(when(col("r_dense").isNotNull && col("r_sparse").isNotNull, 1L)
            .otherwise(0L)).as("both_lists"))
    }),


    // CDC storage-savings rollup — the number the q374 chunking exists
    // to produce: total token volume, the volume spent on duplicate
    // chunk copies beyond the first (Σ (n_copies−1)·len — what a
    // content-addressed store deduplicates away), and the e6 savings
    // ratio. One extra bounded aggregate over the q374 chunk frame.
    "q377_cdc_savings" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val toks = t(s, d, "documents").where(col("doc_id") < 300)
        .select(col("doc_id"),
          posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "tok")))
        .withColumn("cut",
          when(TextFunctions.hash60(col("tok")) % 16 === 0L, 1L).otherwise(0L))
      val w = Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
      val chunks = toks
        .withColumn("chunk_id", coalesce(sum("cut").over(w), lit(0L)))
        .groupBy("doc_id", "chunk_id")
        .agg(count(lit(1)).as("chunk_len"),
          md5(array_join(transform(
            array_sort(collect_list(struct(col("pos"), col("tok")))),
            x => x.getField("tok")), " ")).as("chunk_fp"))
      chunks.groupBy("chunk_fp")
        .agg(count(lit(1)).as("n_copies"), min("chunk_len").as("len"))
        .agg(sum(expr("n_copies * len")).as("total_tok"),
          sum(expr("(n_copies - 1) * len")).as("dup_tok"),
          count(lit(1)).as("n_unique_chunks"))
        .select(col("total_tok"), col("dup_tok"), col("n_unique_chunks"),
          expr("dup_tok * 1000000 div total_tok").as("savings_e6"))
    }),


    // Embedding centroid-drift monitor — the production check that an
    // embedding space hasn't moved between two snapshots (model
    // retrain, data shift): per label, the centroid of the even-id half
    // vs the odd-id half, and the exact integer squared-L2 between them
    // in e6 micro-units (dims quantized to e6 BEFORE the mean — the
    // q145 Lloyd convention, so trunc-div centroids replay exactly).
    // Large dist2 on a label = that region of the space moved. Scale
    // shape: one posexplode + one (label, half, dim) groupBy + a
    // label-keyed 64-term fold; no pairwise anything.
    "q375_centroid_drift" -> ((s, d) => {
      val q = t(s, d, "embeddings")
        .select(col("label").cast("long").as("lab"),
          (col("vec_id") % 2 === 0).as("even"),
          posexplode(expr(
            """transform(embedding,
                 v -> cast(floor(cast(v as double) * 1000000.0) as bigint))"""))
            .as(Seq("dim", "v")))
      val cent = q.groupBy("lab", "even", "dim")
        .agg(expr("sum(v) div count(1)").as("c"), count(lit(1)).as("n"))
      cent.groupBy("lab", "dim")
        .agg(max(when(col("even"), col("c"))).as("ce"),
          max(when(!col("even"), col("c"))).as("co"),
          max(when(col("even"), col("n"))).as("ne"),
          max(when(!col("even"), col("n"))).as("no"))
        .groupBy("lab")
        .agg(max("ne").as("n_even"), max("no").as("n_odd"),
          sum(expr("(ce - co) * (ce - co)")).as("dist2_e12"))
    }),


    // Diminishing-novelty curve — the "is more data still worth
    // collecting" readout: order the corpus by doc_id decile (the
    // collection-time proxy) and report, per decile, the fraction of
    // its distinct 3-gram hashes NEVER seen in any earlier decile.
    // Novelty decaying toward zero means new data repeats the old —
    // the collection-ROI curve (Heaps-law q296's actionable cousin).
    // One hash-keyed aggregate folds each gram's decile SET into a
    // 10-bit mask (bit_or partials collapse duplicate grams map-side, so
    // the single shuffle carries one row per distinct hash per map task
    // — the r14 reshape: the old distinct → groupBy(min) → join-back
    // chain was three exchanges over the full (dec, h) pair stream for
    // the same answer). Per decile: present = bit set; novel = no lower
    // bit set (first occurrence). All counts exact, output unchanged.
    "q376_novelty_curve" -> ((s, d) => {
      val nDf = t(s, d, "documents").agg(max("doc_id").as("max_id"))
      val grams = t(s, d, "documents")
        .where(size(TextFunctions.tokens(col("text"))) >= 3)
        .crossJoin(broadcast(nDf))
        .select(expr("least(9L, doc_id * 10 div (max_id + 1))").as("dec"),
          explode(Dedup.shingles(col("text"), 3)).as("g"))
        .select(col("dec"), TextFunctions.hash60(col("g")).as("h"))
      grams
        .groupBy("h")
        .agg(expr("bit_or(shiftleft(1L, cast(dec as int)))").as("mask"))
        .select(explode(expr(
          "filter(sequence(0L, 9L), x -> (shiftright(mask, cast(x as int)) % 2) = 1)"))
          .as("dec"), col("mask"))
        .groupBy("dec")
        .agg(count(lit(1)).as("n_distinct"),
          sum(when(expr("(mask & (shiftleft(1L, cast(dec as int)) - 1)) = 0"),
            1L).otherwise(0L)).as("n_novel"))
        .select(col("dec"), col("n_distinct"), col("n_novel"),
          expr("n_novel * 1000000 div n_distinct").as("novelty_e6"))
    }),


    // Leakage-free fold assignment — the FIX for what q371 measures:
    // fold by near-dup COMPONENT (hash of the component representative),
    // not by document, so every near-dup pair lands in the same fold by
    // construction. Output per fold: docs, components — and the
    // recomputed cross-fold leak count, which the query proves is ZERO
    // (the q371 audit run against the fixed assignment). Scale shape:
    // the component machinery + one rep-keyed hash + a 5-group
    // aggregate; the leak recheck is the capped candidate join again.
    "q373_component_folds" -> ((s, d) => {
      val docs = t(s, d, "documents").where(col("doc_id") < 300)
      val comp = Dedup.dedupNearDupes(docs, "doc_id", "text",
          maxBucket = Int.MaxValue)
        .select(col("doc_id"), col("rep_id"))
      val fold = comp.select(col("doc_id"),
        (TextFunctions.hash60(concat(lit("fold:"), col("rep_id").cast("string")))
          % 5).as("fold"), col("rep_id"))
      val leaks = Dedup.lshCandidatePairs(docs, "doc_id", "text")
        .join(fold.select(col("doc_id").as("id1"), col("fold").as("f1")), "id1")
        .join(fold.select(col("doc_id").as("id2"), col("fold").as("f2")), "id2")
        .agg(coalesce(sum(when(col("f1") =!= col("f2"), 1L).otherwise(0L)),
          lit(0L)).as("n_leaks"))
      fold.groupBy("fold")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct("rep_id").as("n_components"))
        .crossJoin(broadcast(leaks))
    }),


    // Content-defined chunking dedup (the FastCDC/rsync posture, at
    // token granularity): chunk boundaries are CONTENT-derived — a cut
    // wherever the token's 60-bit hash ≡ 0 (mod 16) — so an insertion
    // shifts only its own chunk while every other chunk keeps its
    // identity, which is why storage dedup uses CDC instead of fixed
    // windows. Chunks fingerprint by md5 over the joined tokens;
    // cross-document duplicate chunks (count > 1) are the shared spans
    // dedup can collapse. Scale shape: one explode + a doc-keyed
    // cumulative-cut window (islands) + one chunk-hash groupBy.
    "q374_cdc_chunks" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val toks = t(s, d, "documents").where(col("doc_id") < 300)
        .select(col("doc_id"),
          posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "tok")))
        .withColumn("cut",
          when(TextFunctions.hash60(col("tok")) % 16 === 0L, 1L).otherwise(0L))
      val w = Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
      val chunks = toks
        .withColumn("chunk_id", coalesce(sum("cut").over(w), lit(0L)))
        .groupBy("doc_id", "chunk_id")
        .agg(count(lit(1)).as("chunk_len"),
          md5(array_join(transform(
            array_sort(collect_list(struct(col("pos"), col("tok")))),
            x => x.getField("tok")), " ")).as("chunk_fp"))
      val wf = Window.partitionBy("chunk_fp").orderBy("doc_id", "chunk_id")
      chunks.withColumn("rn", row_number().over(wf))
        .groupBy("chunk_fp")
        .agg(count(lit(1)).as("n_copies"), min("chunk_len").as("chunk_len"),
          max(when(col("rn") === 1, col("doc_id"))).as("first_doc"),
          max(when(col("rn") === 1, col("chunk_id"))).as("first_chunk"))
        .where(col("n_copies") > 1L)
    }),


    // Effective dataset size accounting — the topline a curation run
    // reports: per source, raw docs/tokens, tokens surviving EXACT
    // dedup (one representative per content fingerprint), and tokens
    // surviving near-dup dedup on top (q76's component keep rule) —
    // with e6 retention ratios. "How much data do we actually have" is
    // the first question a pretraining plan asks; answering it without
    // this accounting double-counts boilerplate. Scale shape: one
    // fingerprint groupBy + the capped component machinery on the
    // bounded fixture population + keyed joins; output is #sources
    // rows.
    "q372_effective_tokens" -> ((s, d) => {
      val docs = t(s, d, "documents").where(col("doc_id") < 300)
        .select(col("doc_id"), col("source"),
          TextFunctions.alnumTokenCount(col("text")).cast("long").as("ntok"),
          TextFunctions.fingerprint(col("text")).as("fp"))
      val exactKeep = docs
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("fp")
            .orderBy("doc_id")))
        .withColumn("keep_exact", col("rn") === 1).drop("rn")
      val nearKeep = Dedup.dedupNearDupes(
          t(s, d, "documents").where(col("doc_id") < 300),
          "doc_id", "text", maxBucket = Int.MaxValue)
        .select(col("doc_id"), col("is_kept").as("keep_near"))
      exactKeep.join(nearKeep, "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("ntok").as("raw_tok"),
          sum(when(col("keep_exact"), col("ntok")).otherwise(0L))
            .as("exact_tok"),
          sum(when(col("keep_exact") && col("keep_near"), col("ntok"))
            .otherwise(0L)).as("near_tok"))
        .select(col("source"), col("n_docs"), col("raw_tok"),
          col("exact_tok"), col("near_tok"),
          expr("exact_tok * 1000000 div raw_tok").as("exact_retention_e6"),
          expr("near_tok * 1000000 div raw_tok").as("near_retention_e6"))
    }),


    // Shuffle-key skew audit — the other pre-flight planning readout
    // (q369's sibling): the row distribution a keyed shuffle on user_id
    // would produce across 32 buckets, with each bucket's share and the
    // max/avg skew factor — the number that decides salting (q93/q100)
    // before the job runs. The bucket hash is the engine-portable
    // md5-60 (NOT Spark's Murmur3, which an external oracle cannot
    // replay). One map pass + one 32-group aggregate.
    "q370_shuffle_skew_audit" -> ((s, d) => {
      val b = t(s, d, "events")
        .select((TextFunctions.hash60(col("user_id").cast("string")) % 32)
          .as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
      val tot = b.agg(sum("n").as("total"), count(lit(1)).as("n_buckets"),
        max("n").as("max_n"))
      b.crossJoin(broadcast(tot))
        .select(col("bucket"), col("n"),
          expr("n * 1000000 div total").as("share_e6"),
          expr("max_n * 1000 div (total div n_buckets)").as("skew_e3"))
    }),


    // Join-cardinality estimator audit — the pre-join planning number
    // every cost-based optimizer computes, checked against truth: the
    // EXACT join output size Σ c₁(k)·c₂(k) (two keyed counts + one
    // key join — never materializing the join itself) vs the System-R
    // independence estimate |R|·|S| / max(ndv₁, ndv₂), with the error
    // ratio in e6. On skewed keys the estimate undershoots — this audit
    // is how you know to switch to a histogram. Scale shape: two
    // groupBys + one key-keyed join of count frames; the join output is
    // never built.
    "q369_join_cardinality" -> ((s, d) => {
      val o = t(s, d, "orders").groupBy(col("o_orderkey").as("k"))
        .agg(count(lit(1)).as("c1"))
      val l = t(s, d, "lineitem").groupBy(col("l_orderkey").as("k"))
        .agg(count(lit(1)).as("c2"))
      val actual = o.join(l, "k")
        .agg(sum(expr("c1 * c2")).as("actual_rows"))
      val stats = o.agg(sum("c1").as("n1"), count(lit(1)).as("ndv1"))
        .crossJoin(l.agg(sum("c2").as("n2"), count(lit(1)).as("ndv2")))
      actual.crossJoin(broadcast(stats))
        .select(col("actual_rows"), col("n1"), col("n2"), col("ndv1"),
          col("ndv2"),
          expr("n1 * n2 div greatest(ndv1, ndv2)").as("estimate_rows"),
          expr("(n1 * n2 div greatest(ndv1, ndv2)) * 1000000 div actual_rows")
            .as("est_over_actual_e6"))
    }),


    // Quality-aware dedup representative — production "keep best, not
    // first": within each near-dup component (q76's distributed CC),
    // the kept copy is the argmax by content length (alnum tokens, tie
    // by id), the rule web-corpus dedup actually ships (keep the
    // longest/cleanest variant, not the smallest id). Scale shape:
    // q76's component machinery + one component-KEYED argmax window +
    // one join back — nothing global.
    "q367_dedup_keep_best" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, d, "documents").where(col("doc_id") < 300)
      val comp = Dedup.dedupNearDupes(docs, "doc_id", "text",
          maxBucket = Int.MaxValue)
        .select(col("doc_id"), col("rep_id"))
      val ntok = docs.select(col("doc_id"),
        TextFunctions.alnumTokenCount(col("text")).cast("long").as("ntok"))
      val f = comp.join(ntok, "doc_id")
      val w = Window.partitionBy("rep_id").orderBy(desc("ntok"), asc("doc_id"))
      val best = f.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("rep_id"), col("doc_id").as("best_id"))
      f.join(best, "rep_id")
        .select(col("doc_id"), col("rep_id"), col("ntok"), col("best_id"),
          (col("doc_id") === col("best_id")).as("is_kept"))
    }),


    // Time-decayed popularity — the freshness-weighted ranking a feed /
    // trending surface computes, with the decay EXACT: score halves per
    // week of age, realized as an integer shiftright of the e3 value
    // (floor(value·1e3) >> age_weeks) — no pow(), no float decay, and
    // a guard at 63 bits where Java's >> would wrap (shift masks to
    // n & 63) but DuckDB's saturates. Top-10 per event type by decayed
    // score via a type-KEYED window; the "now" anchor is the corpus
    // max timestamp (broadcast scalar), so the query is deterministic.
    "q368_decayed_popularity" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, d, "events").select(col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("ts_s"),
        floor(col("value") * 1000).cast("long").as("v_e3"))
      val anchor = ev.agg(max("ts_s").as("now_s"))
      val w = Window.partitionBy("event_type")
        .orderBy(desc("decayed_e3"), asc("event_id"))
      ev.crossJoin(broadcast(anchor))
        .withColumn("age_weeks", expr("(now_s - ts_s) div 604800"))
        .withColumn("decayed_e3", expr(
          "CASE WHEN age_weeks >= 63 THEN 0L ELSE shiftright(v_e3, cast(age_weeks as int)) END"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .where(col("rnk") <= 10)
        .select(col("event_type"), col("event_id"), col("age_weeks"),
          col("decayed_e3"), col("rnk"))
    }),


    // Dedup-induced mixture shift — the accounting every curation run
    // owes its mixture designer: near-dup keep-one (the q76 CC
    // machinery) removes MORE from sources that duplicate more, so the
    // post-dedup token shares are NOT the pre-dedup shares the mixture
    // was tuned on. Reports per source: docs/tokens before and after,
    // share before/after (e6), and the shift. Scale shape: the capped
    // LSH candidate join + distributed CC + two keyed aggregates with
    // a 1-row totals broadcast.
    "q420_dedup_mixture_shift" -> ((s, d) => {
      val docs = t(s, d, "documents").where(col("doc_id") < 300)
      val kept = Dedup.dedupNearDupes(docs, "doc_id", "text")
        .select(col("source"), col("is_kept"),
          size(TextFunctions.tokens(col("text"))).cast("long").as("nt"))
      val g = kept.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(col("is_kept").cast("long")).as("n_kept"),
        sum("nt").as("tok_before"),
        sum(when(col("is_kept"), col("nt")).otherwise(0L)).as("tok_after"))
      val tot = g.agg(sum("tok_before").as("tb"), sum("tok_after").as("ta"))
      g.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("n_kept"),
          col("tok_before"), col("tok_after"),
          expr("tok_before * 1000000 div tb").as("share_before_e6"),
          expr("tok_after * 1000000 div ta").as("share_after_e6"),
          expr("tok_after * 1000000 div ta - tok_before * 1000000 div tb")
            .as("shift_e6"))
    }),


    // Shingle CONTAINMENT scoring of the LSH candidate pairs (Broder
    // 1997's asymmetric resemblance): Jaccard misses the quote/subset
    // relation — a short doc fully contained in a long one scores
    // |A|/|B| Jaccard (low) but |A∩B|/|A| = 1 containment. Reports
    // both directions next to Jaccard and flags the asymmetric pairs
    // (high max-containment, sub-0.5 Jaccard) — the pairs a
    // quote-aware dedup policy treats differently from mutual
    // near-dups. Scale shape: the capped banded candidate join + one
    // keyed join per side to the shingle-set frame; set ops are
    // per-pair map-side.
    "q421_containment" -> ((s, d) => {
      val p = Dedup.MinHashParams()
      val docs = t(s, d, "documents").where(col("doc_id") < 300)
      val sh = docs
        .where(size(TextFunctions.tokens(col("text"))) >= p.shingleSize)
        .select(col("doc_id"),
          array_distinct(Dedup.shingles(col("text"), p.shingleSize)).as("shs"))
      val pairs = Dedup.lshCandidatePairs(docs, "doc_id", "text", p)
      pairs
        .join(sh.select(col("doc_id").as("id1"), col("shs").as("s1")), "id1")
        .join(sh.select(col("doc_id").as("id2"), col("shs").as("s2")), "id2")
        .withColumn("inter", size(array_intersect(col("s1"), col("s2"))).cast("long"))
        .withColumn("l1", size(col("s1")).cast("long"))
        .withColumn("l2", size(col("s2")).cast("long"))
        .select(col("id1"), col("id2"), col("inter"), col("l1"), col("l2"),
          expr("inter * 1000000 div (l1 + l2 - inter)").as("jaccard_e6"),
          expr("inter * 1000000 div l1").as("cont_1in2_e6"),
          expr("inter * 1000000 div l2").as("cont_2in1_e6"))
        .withColumn("asymmetric", expr(
          """greatest(cont_1in2_e6, cont_2in1_e6) >= 800000
             AND jaccard_e6 < 500000"""))
    }),


    // Greedy k-center coreset selection (Gonzalez 1985; the Sener &
    // Savarese 2018 active-learning/coreset rule): pick the 10 most
    // mutually-distant embeddings — seed with the min-id point, then
    // repeatedly add the point FARTHEST from its nearest chosen center.
    // The selection each labeling/distillation budget round actually
    // wants: maximal coverage of the embedding space, no duplicates.
    // Distances are exact integer L2 on e6-quantized vectors (the q212
    // convention) so every argmax replays cross-engine (ties → min
    // vec_id via the max(struct(d2, −id)) trick). The running
    // min-distance frame is updated INCREMENTALLY — each round computes
    // distances to the ONE new center (least(d2min, d2new)), the
    // standard trick that makes greedy k-center O(k·n) not O(k²·n).
    // Scale shape: per round one broadcast of a single center + one
    // map + one argmax aggregate (all distributed); the sequential k
    // loop is the algorithm, k bounded (10). localCheckpoint per round
    // keeps the lineage flat (the q132/q324 rule). Oracle: 10 unrolled
    // MATERIALIZED rounds.
    "q410_kcenter_coreset" -> ((s, d) => {
      val ve = t(s, d, "embeddings").select(col("vec_id"),
        expr("""transform(embedding,
                 v -> cast(floor(cast(v as double) * 1000000.0) as bigint))""")
          .as("ve"))
        .persist() // scanned once per round against the new center
      val seed = ve.agg(min("vec_id")).head().getLong(0)
      def d2To(cid: Long): DataFrame = {
        val c = ve.where(col("vec_id") === cid).select(col("ve").as("ce"))
        ve.crossJoin(broadcast(c))
          .select(col("vec_id"), expr(
            """aggregate(zip_with(ve, ce, (a, b) -> (a - b) * (a - b)),
               cast(0 as bigint), (acc, x) -> acc + x)""").as("d2"))
      }
      var dmin = d2To(seed).withColumnRenamed("d2", "d2min")
        .localCheckpoint(true)
      var picks = Vector((1L, seed, -1L))
      val kTotal = 10
      for (k <- 2 to kTotal) {
        val top = dmin.where(!col("vec_id").isin(picks.map(_._2): _*))
          .agg(max(struct(col("d2min"), (-col("vec_id")).as("nv"))).as("m"))
          .select(col("m.d2min").as("d2"), (-col("m.nv")).as("vid"))
          .head()
        val (d2s, cid) = (top.getLong(0), top.getLong(1))
        picks :+= ((k.toLong, cid, d2s))
        if (k < kTotal) {
          dmin = dmin
            .join(d2To(cid).select(col("vec_id"), col("d2").as("d2new")),
              "vec_id")
            .select(col("vec_id"),
              least(col("d2min"), col("d2new")).as("d2min"))
            .localCheckpoint(true)
        }
      }
      import s.implicits._
      picks.toDF("round", "vec_id", "sel_d2")
    }),


    // Speculative-decoding acceptance model (Leviathan, Kalman & Matias
    // 2023): with draft probability p_d and target probability p_t per
    // token (the standing two-score fixture), the acceptance rate is
    // α = E[min(1, p_t/p_d)], and a k=4-token draft yields
    // E[tokens/step] = (1−α⁵)/(1−α) — the serving-speedup planning
    // number computed from scored logs, no model in the loop. Exact:
    // per-token ratios floored to e6 BEFORE the mean (per-term floor
    // rule); α⁵ by repeated multiplication (powProd rule); ONE pinned
    // tail chain. Scale: one scan, one global aggregate.
    "q471_speculative_acceptance" -> ((s, d) => {
      val e = t(s, d, "embeddings").select(
        expr("""greatest(1L, least(999999L, cast(floor(
            (cast(embedding[0] as double) + 1.0) / 2.0 * 1000000.0)
            as bigint)))""").as("pd_e6"),
        expr("""greatest(1L, least(999999L, cast(floor(
            (cast(embedding[1] as double) + 1.0) / 2.0 * 1000000.0)
            as bigint)))""").as("pt_e6"))
        .withColumn("acc_e6",
          least(lit(1000000L), expr("pt_e6 * 1000000 div pd_e6")))
      e.agg(count(lit(1)).as("n"), sum("acc_e6").as("sa"))
        .withColumn("alpha", (col("sa").cast("double") /
          col("n").cast("double")) / 1000000.0d)
        .select(col("n"),
          expr("sa div n").as("alpha_e6"),
          floor((lit(1.0d) -
            (((col("alpha") * col("alpha")) * (col("alpha") * col("alpha"))) *
              col("alpha"))) /
            (lit(1.0d) - col("alpha")) * 1e6).cast("long")
            .as("tokens_per_step_e6"))
    }),

    // Dedup-threshold sweep — the tuning table behind "dedup at
    // Jaccard ≥ 0.8": for each candidate threshold (0.50–0.90 by
    // 0.10), how many LSH candidate pairs clear it, how many documents
    // the keep-min rule would drop, and how many characters leave the
    // corpus. The cost side of the q366 S-curve (which gives the
    // collision probability; this gives the corpus impact). Exact:
    // integer shingle Jaccard from the verified candidate pairs
    // (bounded audit population), one threshold explode. Scale: the
    // capped banded join + a ×5 bounded explode.
    "q465_dedup_threshold_sweep" -> ((s, d) => {
      val p = Dedup.MinHashParams()
      val docs = t(s, d, "documents").where(col("doc_id") < 300)
      val sh = docs.where(size(TextFunctions.tokens(col("text"))) >= p.shingleSize)
        .select(col("doc_id"),
          array_distinct(Dedup.shingles(col("text"), p.shingleSize)).as("shs"))
      val jac = Dedup.lshCandidatePairs(docs, "doc_id", "text", p)
        .join(sh.select(col("doc_id").as("id1"), col("shs").as("s1")), "id1")
        .join(sh.select(col("doc_id").as("id2"), col("shs").as("s2")), "id2")
        .withColumn("inter", size(array_intersect(col("s1"), col("s2"))).cast("long"))
        .withColumn("uni",
          size(col("s1")).cast("long") + size(col("s2")).cast("long") - col("inter"))
        .select(col("id1"), col("id2"),
          expr("inter * 100 div uni").as("j_e2"))
        .persist() // swept once per threshold
      val chars = docs.select(col("doc_id").as("id2"),
        col("n_chars").as("ch"))
      val th = jac.sparkSession.range(5, 10)
        .select((col("id") * 10L).as("t_e2"))
      th.join(jac, col("j_e2") >= col("t_e2"))
        .groupBy("t_e2", "id2").agg(count(lit(1)).as("np"))
        .join(chars, "id2")
        .groupBy("t_e2")
        .agg(sum("np").as("n_pairs"), count(lit(1)).as("n_docs_removed"),
          sum("ch").as("chars_removed"))
    }),

    // Multi-probe LSH recall audit (Lv et al. VLDB 2007) — the memory/
    // recall trade measured: with ONE 15-bit SimHash band, probing only
    // the exact bucket vs additionally probing its 15 Hamming-1
    // neighbor buckets (the multi-probe trick that buys recall without
    // more hash tables). Ground truth = all pairs at Hamming ≤ 6 on
    // the bounded audit population (the q366 posture). Reports both
    // candidate counts and recalls — the table that decides whether to
    // add probes or bands. Exact: integer hashes and counts. Scale:
    // probe side explodes ×16 (bounded), joins stay bucket-keyed.
    "q464_multiprobe_lsh" -> ((s, d) => {
      val docs = t(s, d, "documents").where(col("doc_id") < 300)
      val sims = Dedup.simhashRows(docs, "doc_id", "text")
        .select(col("doc").as("doc_id"), col("sim"))
        .persist() // truth pairs + both probe paths read it
      val truth = sims.select(col("doc_id").as("id1"), col("sim").as("h1"))
        .join(sims.select(col("doc_id").as("id2"), col("sim").as("h2")),
          col("id1") < col("id2"))
        .where(expr("bit_count(h1 ^ h2) <= 6"))
        .select(col("id1"), col("id2"))
        .persist() // three recall joins read it
      val keyed = sims.select(col("doc_id"), (col("sim") % 32768L).as("key"))
      val base = keyed.select(col("doc_id").as("id1"), col("key"))
        .join(keyed.select(col("doc_id").as("id2"), col("key")), Seq("key"))
        .where(col("id1") < col("id2"))
        .select(col("id1"), col("id2")).distinct()
      val probes = keyed.select(col("doc_id"),
          explode(expr("""array_union(array(key), transform(sequence(0, 14),
            b -> key ^ shiftleft(1L, b)))""")).as("key"))
      val mp = probes.select(col("doc_id").as("id1"), col("key"))
        .join(keyed.select(col("doc_id").as("id2"), col("key")), Seq("key"))
        .where(col("id1") < col("id2"))
        .select(col("id1"), col("id2")).distinct()
      val nT = truth.agg(count(lit(1)).as("n_truth"))
      val nB = base.agg(count(lit(1)).as("n_base"))
      val nM = mp.agg(count(lit(1)).as("n_multiprobe"))
      val rB = truth.join(base, Seq("id1", "id2"))
        .agg(count(lit(1)).as("hit_base"))
      val rM = truth.join(mp, Seq("id1", "id2"))
        .agg(count(lit(1)).as("hit_mp"))
      nT.crossJoin(nB).crossJoin(nM).crossJoin(rB).crossJoin(rM)
        .select(col("n_truth"), col("n_base"), col("n_multiprobe"),
          col("hit_base"), col("hit_mp"),
          expr("hit_base * 1000000 div greatest(n_truth, 1L)")
            .as("recall_base_e6"),
          expr("hit_mp * 1000000 div greatest(n_truth, 1L)")
            .as("recall_mp_e6"))
    }),

    // Embedding isotropy audit (Ethayarajh 2019 / Mu & Viswanath's
    // common-direction diagnosis): two cheap global statistics that
    // catch anisotropic collapse before any ANN index is built — the
    // mean cosine over hash-paired random couples (≈0 when isotropic,
    // ≫0 when a common direction dominates) and ‖μ‖²/E‖x‖² (share of
    // energy in the mean vector). Exact: integer dots/norms, per-pair
    // cosine floored e6 BEFORE the mean; the 64 per-dim mean terms
    // fold in dim order. Scale: one rank pass for pairing, one
    // posexplode aggregate — both linear.
    "q477_isotropy" -> ((s, d) => {
      val q = expr(
        "transform(embedding, x -> cast(floor(cast(x as double) * 64) as bigint))")
      val e = t(s, d, "embeddings").select(col("vec_id"), q.as("ve"))
        .withColumn("hv", TextFunctions.hash60(concat(lit("iso:"),
          col("vec_id").cast("string"))))
      val r = graft.operators.Ranking.globalRank(e, "r",
        col("hv").asc, col("vec_id").asc)
      val pairs = r.where((col("r") - 1L) % 2L === 0L)
        .select(expr("(r - 1) div 2").as("j"), col("ve").as("v1"))
        .join(r.where((col("r") - 1L) % 2L === 1L)
          .select(expr("(r - 1) div 2").as("j"), col("ve").as("v2")), "j")
      def dot(a: String, b: String) = expr(
        s"""aggregate(zip_with($a, $b, (p, q) -> p * q),
           cast(0 as bigint), (acc, x) -> acc + x)""")
      val cos = pairs
        .select(floor(dot("v1", "v2").cast("double") /
          (sqrt(dot("v1", "v1").cast("double")) *
            sqrt(dot("v2", "v2").cast("double"))) * 1e6).cast("long")
          .as("cos_e6"))
        .agg(count(lit(1)).as("n_pairs"),
          expr("sum(cos_e6) div count(1)").as("mean_cos_e6"))
      val dims = t(s, d, "embeddings")
        .select(posexplode(q).as(Seq("dim", "v")))
        .groupBy("dim").agg(sum("v").as("sv"), count(lit(1)).as("n"),
          sum(col("v") * col("v")).as("ssv"))
      val iso = dims.agg(max("n").as("n"), sum("ssv").as("ss_all"),
          array_sort(collect_list(struct(col("dim"), col("sv"), col("n"))))
            .as("ps"))
        .withColumn("mu2", aggregate(transform(col("ps"),
          x => (x.getField("sv").cast("double") /
            x.getField("n").cast("double")) *
            (x.getField("sv").cast("double") /
              x.getField("n").cast("double"))),
          lit(0.0d), (acc, x) => acc + x))
        .select(floor(col("mu2") /
          (col("ss_all").cast("double") / col("n").cast("double")) * 1e6)
          .cast("long").as("mean_energy_ratio_e6"))
      cos.crossJoin(iso)
    }),

    // Linear-time MMD² estimator (Gretton et al. 2012, §6 — MMD_l):
    // the two-sample embedding-space test whose cost is O(n), not the
    // O(n²) kernel matrix: pair consecutive samples within each label
    // group (deterministic vec_id order via the two-phase globalRank)
    // and average h = k(x,x')+k(y,y')−k(x,y')−k(x',y) over aligned
    // pair indices, linear kernel. This is THE estimator shape that
    // survives 100 TB — one rank pass per group, keyed self-joins on
    // the pair index, integer dots throughout (fully exact, no floats
    // at all). A near-zero mean says the two label groups share an
    // embedding distribution; q391's Wasserstein sees only 1-D
    // marginals.
    "q459_mmd_linear" -> ((s, d) => {
      val q = expr(
        "transform(embedding, x -> cast(floor(cast(x as double) * 64) as bigint))")
      val e = t(s, d, "embeddings").select(col("vec_id"),
        (col("label") % 2 === 1).as("grp"), q.as("ve"))
      def pairs(g: Boolean, p1: String, p2: String): DataFrame = {
        val r = graft.operators.Ranking.globalRank(
          e.where(col("grp") === g).select(col("vec_id"), col("ve")),
          "r", col("vec_id").asc)
        r.where((col("r") - 1L) % 2L === 0L)
          .select(expr("(r - 1) div 2").as("j"), col("ve").as(p1))
          .join(r.where((col("r") - 1L) % 2L === 1L)
            .select(expr("(r - 1) div 2").as("j"), col("ve").as(p2)), "j")
      }
      def dot(a: String, b: String) = expr(
        s"""aggregate(zip_with($a, $b, (p, q) -> p * q),
           cast(0 as bigint), (acc, x) -> acc + x)""")
      pairs(g = true, "x1", "x2").join(pairs(g = false, "y1", "y2"), "j")
        .select((dot("x1", "x2") + dot("y1", "y2") -
          dot("x1", "y2") - dot("x2", "y1")).as("h"))
        .agg(count(lit(1)).as("n_pairs"), sum("h").as("sum_h"))
        .select(col("n_pairs"), col("sum_h"),
          expr("sum_h div greatest(n_pairs, 1L)").as("mmd2_mean"))
    }),

    // Davies–Bouldin cluster-validity index (1979) — the
    // centroid-based complement to q396's silhouette: per label,
    // within-cluster scatter s = mean point-to-centroid distance, and
    // for each cluster its worst (s_i+s_j)/M_ij ratio over the other
    // centroids. Exact: integer centroids (per-dim trunc-div means via
    // posexplode), per-point sqrt floored to e3 BEFORE the mean (the
    // per-term-floor rule; sqrt is IEEE-exact), ratios one trunc-div.
    // Scale: one explode scan, keyed joins on (label, dim), a k²-
    // bounded centroid grid.
    "q460_davies_bouldin" -> ((s, d) => {
      val q = expr(
        "transform(embedding, x -> cast(floor(cast(x as double) * 64) as bigint))")
      val pts = t(s, d, "embeddings").select(col("vec_id"),
          col("label").cast("long").as("lab"), posexplode(q).as(Seq("dim", "v")))
      val cen = pts.groupBy("lab", "dim")
        .agg(sum("v").as("sv"), count(lit(1)).as("n"))
        .select(col("lab"), col("dim"), expr("sv div n").as("cd"))
        .persist() // point scatter + the centroid grid both read it
      val s_i = pts.join(cen, Seq("lab", "dim"))
        .groupBy("lab", "vec_id")
        .agg(sum((col("v") - col("cd")) * (col("v") - col("cd"))).as("d2"))
        .select(col("lab"),
          floor(sqrt(col("d2").cast("double")) * 1e3).cast("long").as("s_e3"))
        .groupBy("lab")
        .agg(count(lit(1)).as("n_pts"), expr("sum(s_e3) div count(1)").as("s_e3"))
      val m = cen.join(cen.select(col("lab").as("lab2"), col("dim"),
          col("cd").as("cd2")), "dim")
        .where(col("lab") =!= col("lab2"))
        .groupBy("lab", "lab2")
        .agg(sum((col("cd") - col("cd2")) * (col("cd") - col("cd2"))).as("m2"))
        .select(col("lab"), col("lab2"),
          floor(sqrt(col("m2").cast("double")) * 1e3).cast("long").as("m_e3"))
      val sj = s_i.select(col("lab").as("lab2"), col("s_e3").as("s2_e3"))
      s_i.join(m, "lab").join(broadcast(sj), "lab2")
        .withColumn("ratio_e6",
          expr("(s_e3 + s2_e3) * 1000000 div greatest(m_e3, 1L)"))
        .groupBy(col("lab"), col("n_pts"), col("s_e3"))
        .agg(max(struct(col("ratio_e6"), col("lab2"))).as("mx"))
        .select(col("lab"), col("n_pts"), col("s_e3"),
          col("mx.ratio_e6").as("worst_ratio_e6"),
          col("mx.lab2").as("worst_other"))
    }),

    // Greedy facility-location selection (Nemhauser–Wolsey–Fisher 1978
    // (1−1/e) guarantee; Wei/Iyer/Bilmes 2015 for data-subset
    // selection) — the "summarize the corpus" complement to q410's
    // k-center "spread out" rule: pick k=5 exemplars from a bounded
    // candidate pool (vec_id < 64) maximizing the submodular coverage
    // F(S) = Σ_v max_{c∈S} sim(v,c), sim = max(0, integer dot on
    // 64-quantized vectors). Each greedy round scores every remaining
    // candidate's marginal gain Σ_v max(0, s_vc − cov_v) against the
    // running coverage frame and takes the argmax (ties → min id);
    // coverage then updates against the ONE chosen column — O(k·n·|P|)
    // like q410, never all-pairs. Exact: sims/gains all-integer, so
    // every argmax replays cross-engine. Scale shape: sims = corpus ×
    // bounded pool (linear in corpus); per round one keyed join + a
    // |pool|-row aggregate; the sequential k loop IS the algorithm
    // (k bounded); localCheckpoint per round. Oracle: 5 unrolled
    // MATERIALIZED rounds.
    "q434_facility_location" -> ((s, d) => {
      val q = expr(
        "transform(embedding, x -> cast(floor(cast(x as double) * 64) as bigint))")
      val emb = t(s, d, "embeddings").select(col("vec_id").as("v"), q.as("ve"))
      val pool = t(s, d, "embeddings").where(col("vec_id") < 64)
        .select(col("vec_id").as("c"), q.as("ce"))
      val sims = emb.crossJoin(broadcast(pool))
        .select(col("v"), col("c"), greatest(lit(0L), expr(
          """aggregate(zip_with(ve, ce, (a, b) -> a * b),
             cast(0 as bigint), (acc, x) -> acc + x)""")).as("sv"))
        .persist() // re-probed every greedy round
      var cov = emb.select(col("v"), lit(0L).as("cov")).localCheckpoint(true)
      var chosen = Vector.empty[Long]
      var picks = Vector.empty[(Long, Long, Long, Long)]
      val rounds = 5
      for (r <- 1 to rounds) {
        val g = sims.where(!col("c").isin(chosen: _*))
          .join(cov, "v")
          .where(col("sv") > col("cov"))
          .groupBy("c").agg(sum(col("sv") - col("cov")).as("gain"))
          .agg(max(struct(col("gain"), (-col("c")).as("nc"))).as("m"))
          .select(col("m.gain").as("gain"), (-col("m.nc")).as("cid"))
          .head()
        val (gain, cid) = (g.getLong(0), g.getLong(1))
        chosen :+= cid
        // lazy final round (the q324 rule): round `rounds`' coverage is
        // consumed exactly once (its covTot aggregate) — skip the eager
        // cut and let that one action compute it off the persisted sims
        val covNext = cov.join(sims.where(col("c") === cid)
            .select(col("v"), col("sv").as("snew")), "v")
          .select(col("v"), greatest(col("cov"), col("snew")).as("cov"))
        cov = if (r < rounds) covNext.localCheckpoint(true) else covNext
        val covTot = cov.agg(sum("cov")).head().getLong(0)
        picks :+= ((r.toLong, cid, gain, covTot))
      }
      sims.unpersist()
      import s.implicits._
      picks.toDF("round", "c", "gain", "cov_total")
    }),

    // Bradley–Terry strength fit over sources (Bradley & Terry 1952;
    // Hunter 2004's MM iteration) — the preference-aggregation core of
    // RLHF/eval-arena data work: treat every cross-source document pair
    // as a comparison decided by the longer document (n_chars, the
    // deterministic quality proxy), and fit per-source strengths p_i
    // from the pairwise win matrix. The O(n²) pair count is NEVER
    // materialized: wins_ij = Σ_bkt h_i[bkt]·(h_j below bkt) comes from
    // the two sources' bounded length HISTOGRAMS (one keyed groupBy +
    // a bounded bucket join), the published trick for rank statistics
    // at scale. Win counts normalize to e6 shares (keeps every
    // iteration product inside int64 at any corpus size), then 6 MM
    // rounds p_i ← W_i / Σ_j n_ij/(p_i+p_j) run on the K-source frame
    // in exact trunc-div micro-units, renormalized to mean 1e6 each
    // round — the oracle replays all 6 rounds bit-for-bit (unrolled
    // CTE chain, the doremi pattern). Scale shape: one histogram
    // groupBy; everything after lives on K and K² frames, with the MM
    // loop itself driver-side on the collected K²-row matrix (bounded).
    "q406_bradley_terry" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(col("source"), expr("n_chars div 100").as("bkt"))
      val h = docs.groupBy("source", "bkt").agg(count(lit(1)).as("c"))
      val hb = h.select(col("source").as("sb"), col("bkt").as("bktb"),
        col("c").as("cb"))
      val winsOrd = h.join(hb,
          col("source") =!= col("sb") && col("bkt") > col("bktb"))
        .groupBy("source", "sb").agg(sum(col("c") * col("cb")).as("w"))
        .select(col("source").as("i"), col("sb").as("j"), col("w"))
      val srcs = docs.select("source").distinct()
        .select(col("source").as("i")).persist()
      val gij = srcs.crossJoin(broadcast(srcs.select(col("i").as("j"))))
        .where(col("i") =!= col("j"))
      val ntot = winsOrd.agg(sum("w").as("n_tot"))
      val wij = gij.join(winsOrd, Seq("i", "j"), "left")
        .na.fill(0L, Seq("w"))
        .crossJoin(broadcast(ntot))
        .withColumn("w_e6", expr("w * 1000000 div greatest(n_tot, 1L)"))
        .select("i", "j", "w_e6")
      val nij = wij.join(wij.select(col("j").as("i"), col("i").as("j"),
          col("w_e6").as("wji_e6")), Seq("i", "j"))
        .withColumn("n_e6", col("w_e6") + col("wji_e6"))
        .select("i", "j", "w_e6", "n_e6").persist()
      val wI = nij.groupBy("i").agg(sum("w_e6").as("wi_e6"))
      // The MM iteration runs DRIVER-SIDE on the collected K²-row win
      // matrix (K = #sources being ranked — bounded by definition in an
      // arena/preference setting, like BpeTrainer's vocab or the
      // ActiveLearning scalars; the data-sized histogram work above
      // stays distributed). 6 distributed rounds of 4 jobs each
      // measured 10 s of pure scheduling overhead on a 10-row frame.
      // Every operation is a Long trunc-div, so the SQL oracle replays
      // the loop bit-for-bit. praw is capped at 1e12 and the
      // renormalization divides by the MEAN (tp div k) so no product
      // can leave int64 whatever the win-matrix shape.
      val rows = nij.join(wI, "i")
        .select("i", "j", "n_e6", "wi_e6").collect()
      val ks = rows.map(_.getString(0)).distinct.sorted
      val k = ks.length.toLong
      val nE6 = rows.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val wiE6 = rows.map(r => r.getString(0) -> r.getLong(3)).toMap
      var pm = ks.map(_ -> 1000000L).toMap
      for (_ <- 1 to 6) {
        val sden = ks.map { i =>
          i -> ks.filter(_ != i).map { j =>
            nE6.getOrElse((i, j), 0L) * 1000000000000L / (pm(i) + pm(j))
          }.sum
        }.toMap
        val praw = ks.map { i =>
          i -> math.min(1000000000000L, math.max(1L,
            wiE6(i) * 1000000000000L / math.max(sden(i), 1L)))
        }.toMap
        val tp = ks.map(praw).sum
        pm = ks.map { i =>
          i -> praw(i) * 1000000L / math.max(tp / k, 1L)
        }.toMap
      }
      val out = ks.toSeq.map(i => (i, wiE6(i), pm(i)))
      import s.implicits._
      out.toDF("source", "win_share_e6", "bt_strength_e6")
    }),


    // MinHash banding parameter TUNER — the decision q366's S-curve
    // validation feeds: for EVERY (bands b, rows r) factorization of a
    // 120-permutation signature, score the banding against the
    // corpus's own measured pair-similarity workload (the bounded
    // all-pairs population, exact shingle Jaccard) at dup threshold
    // τ* = 0.5: expected caught/missed true-dup mass and expected
    // false-positive candidate mass, Σ per-pair floored-e6 collision
    // probabilities P(j) = 1−(1−j^r)^b; chosen = argmin of
    // missed + fp/10 (candidate verification is ~10× cheaper than a
    // missed dup is costly). The datasketch-style tuner integrates
    // against an ASSUMED uniform density; integrating the MEASURED
    // density is the whole point of running it in the engine. All
    // j^r/(1−j^r)^b powers ride named square columns + a CASE of
    // pinned square-and-multiply chains (powProd/powCase — identical
    // generated text in both engines; pow() would not replay).
    // Scale shape: the all-pairs ground truth is definitionally
    // quadratic and rides the bounded q58/q273 population; the 16-row
    // grid is a broadcast; everything after is one keyed aggregate.
    "q405_lsh_param_tuner" -> ((s, d) => {
      val p = Dedup.MinHashParams()
      val docs = t(s, d, "documents").where(col("doc_id") < 300)
      val sh = docs
        .where(size(TextFunctions.tokens(col("text"))) >= p.shingleSize)
        .select(col("doc_id"),
          array_distinct(Dedup.shingles(col("text"), p.shingleSize)).as("shs"))
      val pairs = sh.select(col("doc_id").as("id1"), col("shs").as("s1"))
        .join(sh.select(col("doc_id").as("id2"), col("shs").as("s2")),
          col("id1") < col("id2"))
        .withColumn("inter", size(array_intersect(col("s1"), col("s2"))).cast("long"))
        .withColumn("uni",
          size(col("s1")).cast("long") + size(col("s2")).cast("long") - col("inter"))
        .select(col("id1"), col("id2"), col("inter"), col("uni"))
        .withColumn("j", col("inter").cast("double") / col("uni").cast("double"))
        .withColumn("j_e6", expr("inter * 1000000 div uni"))
      val grid = { import s.implicits._; lshTunerGrid.toDF("b", "r") }
      var df = pairs.crossJoin(broadcast(grid))
      for (k <- Seq(2, 4, 8, 16, 32, 64))
        df = df.withColumn(s"j$k",
          col(if (k == 2) "j" else s"j${k / 2}") * col(if (k == 2) "j" else s"j${k / 2}"))
      df = df.withColumn("jr", expr(powCase("j", "r", lshTunerGrid.map(_._2))))
        .withColumn("tt", lit(1.0) - col("jr"))
      for (k <- Seq(2, 4, 8, 16, 32, 64))
        df = df.withColumn(s"tt$k",
          col(if (k == 2) "tt" else s"tt${k / 2}") * col(if (k == 2) "tt" else s"tt${k / 2}"))
      val agg = df
        .withColumn("tb", expr(powCase("tt", "b", lshTunerGrid.map(_._1))))
        .withColumn("p_e6", floor((lit(1.0) - col("tb")) * 1e6).cast("long"))
        .groupBy("b", "r").agg(
          count(lit(1)).as("n_pairs"),
          sum(when(col("j_e6") >= 500000L, 1L).otherwise(0L)).as("n_true"),
          sum(when(col("j_e6") >= 500000L, col("p_e6")).otherwise(0L))
            .as("caught_e6"),
          sum(when(col("j_e6") >= 500000L, lit(1000000L) - col("p_e6"))
            .otherwise(0L)).as("missed_e6"),
          sum(when(col("j_e6") < 500000L, col("p_e6")).otherwise(0L))
            .as("fp_e6"))
        .withColumn("cost_e6", expr("missed_e6 + fp_e6 div 10"))
      val best = agg.agg(min("cost_e6").as("min_cost"))
      agg.crossJoin(broadcast(best))
        .select(col("b").cast("long").as("b"), col("r").cast("long").as("r"),
          col("n_pairs"), col("n_true"), col("caught_e6"), col("missed_e6"),
          col("fp_e6"), col("cost_e6"),
          (col("cost_e6") === col("min_cost")).as("is_chosen"))
    }),


    // IDF-weighted Jaccard rerank of the LSH candidates (the weighted
    // set-similarity of Chum–Philbin–Zisserman 2008): plain Jaccard
    // treats "the" and a rare entity as equal overlap evidence; here
    // each token weighs w_t = n_docs div df_t (integer IDF), and the
    // candidate pair is re-scored by informative overlap
    // WJ = Σ min(c1,c2)·w / Σ max(c1,c2)·w over the pair's token
    // multiset union — the rerank that separates boilerplate-overlap
    // pairs from true near-dups before the keep-one step. Exact: all
    // integer counts/weights/trunc-divs. Scale shape: token counts one
    // scan; candidates from the capped banded join; the per-pair union
    // is two keyed joins on (pair, token) — linear in candidates × doc
    // length, never all-pairs.
    "q436_weighted_jaccard" -> ((s, d) => {
      val docs = t(s, d, "documents").where(col("doc_id") < 300)
      val toks = docs.select(col("doc_id"),
          explode(TextFunctions.tokens(col("text"))).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        .persist() // idf + both pair sides read it
      val idf = toks.groupBy("tok").agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(docs.agg(count(lit(1)).as("nd"))))
        .select(col("tok"), expr("nd div df").as("wt"))
      val pairs = Dedup.lshCandidatePairs(docs, "doc_id", "text")
      val pa = pairs.join(toks.select(col("doc_id").as("id1"), col("tok"),
        col("c").as("c1")), "id1")
      val pb = pairs.join(toks.select(col("doc_id").as("id2"), col("tok"),
        col("c").as("c2")), "id2")
      pa.join(pb, Seq("id1", "id2", "tok"), "full")
        .na.fill(0L, Seq("c1", "c2"))
        .join(idf, "tok")
        .groupBy("id1", "id2")
        .agg(sum(least(col("c1"), col("c2")) * col("wt")).as("num"),
          sum(greatest(col("c1"), col("c2")) * col("wt")).as("den"),
          sum(least(col("c1"), col("c2"))).as("ni"),
          sum(greatest(col("c1"), col("c2"))).as("nu"))
        .select(col("id1"), col("id2"),
          expr("num * 1000000 div den").as("wj_e6"),
          expr("ni * 1000000 div nu").as("j_e6"))
    }),

    // Capture–recapture estimate of the TRUE near-duplicate population
    // (Chapman 1951, the bias-corrected Lincoln–Petersen): treat the
    // MinHash-LSH catch and the SimHash catch (q365's two text
    // families) as two independent samples of the unknown near-dup
    // pair population; the overlap m then estimates total population
    // N̂ = (n1+1)(n2+1)/(m+1) − 1 with its Chapman variance — the
    // "how many near-dups did BOTH detectors miss" number a dedup
    // coverage SLA needs, unobtainable from either catch alone.
    // coverage_e6 = observed-union share of N̂. Exact: pure integer
    // counts and trunc-divs. Scale shape: the two banded candidate
    // stages (capped, never all-pairs) + one keyed pair join + three
    // 1-row aggregates.
    "q428_capture_recapture" -> ((s, d) => {
      val docs = t(s, d, "documents").where(col("doc_id") < 300)
      val mh = Dedup.lshCandidatePairs(docs, "doc_id", "text")
        .select(col("id1"), col("id2"))
      val sh = Dedup.hammingBandPairs(
          Dedup.simhashRows(docs, "doc_id", "text"),
          "doc", "sim", nBands = 4, bandBits = 15, cap = 64, maxHamming = 6)
        .select(col("id1"), col("id2"))
      mh.agg(count(lit(1)).as("n1"))
        .crossJoin(sh.agg(count(lit(1)).as("n2")))
        .crossJoin(mh.join(sh, Seq("id1", "id2")).agg(count(lit(1)).as("m")))
        .select(col("n1"), col("n2"), col("m"),
          (col("n1") + col("n2") - col("m")).as("n_union"),
          expr("(n1 + 1) * (n2 + 1) div (m + 1) - 1").as("n_hat"),
          expr("""(n1 + 1) * (n2 + 1) * (n1 - m) * (n2 - m)
            div ((m + 1) * (m + 1) * (m + 2))""").as("var_hat"),
          expr("""CASE WHEN (n1 + 1) * (n2 + 1) div (m + 1) - 1 > 0
            THEN (n1 + n2 - m) * 1000000
              div ((n1 + 1) * (n2 + 1) div (m + 1) - 1)
            ELSE 1000000 END""").as("coverage_e6"))
    }),

    // LSH banding S-curve validation — the calibration every MinHash
    // deployment should run: for all pairs of a bounded population,
    // the EMPIRICAL candidate rate per exact-Jaccard bucket against
    // the THEORETICAL 1−(1−j^r)^b collision curve (r=4 rows, b=8
    // bands). The theory term uses only +,−,×,÷ doubles (three
    // squarings — j⁴ and (1−j⁴)⁸ via repeated multiplication), every
    // one IEEE-correctly-rounded, so the floored e6 value replays
    // bit-exact cross-engine where pow() would not. Scale shape: the
    // all-pairs ground truth is the definitionally quadratic part and
    // rides a bounded population (the q58/q273 posture); the candidate
    // probe is the capped banded join.
    "q366_lsh_s_curve" -> ((s, d) => {
      val p = Dedup.MinHashParams()
      val docs = t(s, d, "documents").where(col("doc_id") < 300)
      val sh = docs
        .where(size(TextFunctions.tokens(col("text"))) >= p.shingleSize)
        .select(col("doc_id"),
          array_distinct(Dedup.shingles(col("text"), p.shingleSize)).as("shs"))
      val pairs = sh.select(col("doc_id").as("id1"), col("shs").as("s1"))
        .join(sh.select(col("doc_id").as("id2"), col("shs").as("s2")),
          col("id1") < col("id2"))
        .withColumn("inter", size(array_intersect(col("s1"), col("s2"))).cast("long"))
        .withColumn("uni",
          size(col("s1")).cast("long") + size(col("s2")).cast("long") - col("inter"))
        .select(col("id1"), col("id2"), col("inter"), col("uni"))
      val cand = Dedup.lshCandidatePairs(docs, "doc_id", "text", p)
        .withColumn("is_cand", lit(1L))
      val j = col("inter").cast("double") / col("uni").cast("double")
      val j4 = (j * j) * (j * j)
      val tc = lit(1.0) - j4
      val t8 = ((tc * tc) * (tc * tc)) * ((tc * tc) * (tc * tc))
      pairs.join(cand, Seq("id1", "id2"), "left")
        .na.fill(0L, Seq("is_cand"))
        .withColumn("theory_e6", floor((lit(1.0) - t8) * 1e6).cast("long"))
        .withColumn("bkt", expr("(inter * 1000000 div uni) div 100000"))
        .groupBy("bkt")
        .agg(count(lit(1)).as("n_pairs"), sum("is_cand").as("n_cand"),
          sum("theory_e6").as("sum_theory_e6"))
        .select(col("bkt"), col("n_pairs"), col("n_cand"),
          expr("n_cand * 1000000 div n_pairs").as("cand_rate_e6"),
          expr("sum_theory_e6 div n_pairs").as("mean_theory_e6"))
    }),


    // Dedup method-agreement report — the methodological audit behind
    // choosing a near-dup detector: the three candidate-pair families
    // (MinHash-LSH on shingle sets, SimHash Hamming bands on token
    // sketches, perceptual-hash bands on the sampled raster) computed
    // over ONE population, then pairwise set agreement (|A∩B| and the
    // pair-set Jaccard). Low agreement is the finding — each family
    // sees a different notion of "near". Scale shape: three banded
    // candidate stages (each capped, never all-pairs) + one keyed
    // self-join on the pair id and two 3-row aggregates.
    "q365_dedup_method_agreement" -> ((s, d) => {
      val docs = t(s, d, "documents").where(col("doc_id") < 300)
      val mh = Dedup.lshCandidatePairs(docs, "doc_id", "text")
        .select(col("id1"), col("id2"), lit("minhash").as("m"))
      val sh = Dedup.hammingBandPairs(
          Dedup.simhashRows(docs, "doc_id", "text"),
          "doc", "sim", nBands = 4, bandBits = 15, cap = 64, maxHamming = 6)
        .select(col("id1"), col("id2"), lit("simhash").as("m"))
      val ph = Dedup.hammingBandPairs(
          graft.operators.Multimodal.withPerceptualHash(
            docs.where(length(col("text")) >= 60)
              .select(col("doc_id"), col("text")), "text", "ph"),
          "doc_id", "ph", nBands = 4, bandBits = 15, cap = 64, maxHamming = 6)
        .select(col("id1"), col("id2"), lit("phash").as("m"))
      val tagged = mh.unionAll(sh).unionAll(ph)
        .persist() // sizes + the pair-id self-join both read it
      val sizes = tagged.groupBy("m").agg(count(lit(1)).as("n"))
      val inter = tagged.as("a").join(tagged.as("b"), Seq("id1", "id2"))
        .where(col("a.m") < col("b.m"))
        .groupBy(col("a.m").as("m1"), col("b.m").as("m2"))
        .agg(count(lit(1)).as("n_inter"))
      sizes.select(col("m").as("m1"), col("n").as("n1"))
        .crossJoin(broadcast(sizes.select(col("m").as("m2"), col("n").as("n2"))))
        .where(col("m1") < col("m2"))
        .join(inter, Seq("m1", "m2"), "left")
        .na.fill(0L, Seq("n_inter"))
        .select(col("m1"), col("m2"), col("n1"), col("n2"), col("n_inter"),
          expr("n_inter * 1000000 div (n1 + n2 - n_inter)").as("jaccard_e6"))
    }),


    // Prompt prefix-sharing audit — the KV-cache planning readout an
    // LLM-serving/training stack computes over its prompt corpus
    // (vLLM-style automatic prefix caching): bucket documents by their
    // leading 32 chars, report per-bucket fan-out and the chars a
    // shared-prefix cache saves (32·(n−1) per bucket), plus each
    // bucket's saving share of the corpus total. Buckets with n = 1
    // save nothing and drop. Scale shape: one map pass (fixed-width
    // prefix — an O(32) substr, not the q355 positional trap), one
    // keyed groupBy, broadcast total.
    "q364_prefix_cache" -> ((s, d) => {
      val b = t(s, d, "documents").where(length(col("text")) >= 32L)
        .select(substring(col("text"), 1, 32).as("prefix"))
        .groupBy("prefix").agg(count(lit(1)).as("n"))
        .where(col("n") > 1L)
        .withColumn("saved_chars", expr("32 * (n - 1)"))
      val tot = b.agg(sum("saved_chars").as("tot_saved"))
      b.crossJoin(broadcast(tot))
        .select(col("prefix"), col("n"), col("saved_chars"),
          expr("saved_chars * 1000000 div tot_saved").as("share_e6"))
    }),


    // Margin-criterion calibration — the measured-quality companion to
    // q352 (the "recall is measured, not asserted" posture): bucket the
    // UNFILTERED margin scores into 0.1-ratio bins and report the
    // same-label rate per bin. A well-behaved margin shows same-label
    // rate rising with the bin — the evidence for the 1.0 acceptance
    // cut; a flat curve means the criterion adds nothing over raw cos.
    // (Measured on the synthetic fixture: FLAT at ~20% — its labels are
    // not cosine-clustered, which is exactly what this audit exists to
    // catch before anyone trusts a margin cut on a new corpus.)
    // Scale shape: q352's celled pair machinery + two keyed label joins
    // + one bounded-domain groupBy.
    "q363_margin_calibration" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val lab = e.select(col("vec_id"), col("label").cast("long").as("lab"))
      Similarity.marginRatio(e, 200L, 4)
        .join(lab.select(col("vec_id").as("id_a"), col("lab").as("lab_a")),
          "id_a")
        .join(lab.select(col("vec_id").as("id_b"), col("lab").as("lab_b")),
          "id_b")
        .withColumn("bkt", expr("margin_e6 div 100000"))
        .groupBy("bkt")
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("lab_a") === col("lab_b"), 1L).otherwise(0L))
            .as("n_same"))
        .select(col("bkt"), col("n_pairs"), col("n_same"),
          expr("n_same * 1000000 div n_pairs").as("same_rate_e6"))
    }),


    // Cross-snapshot manifest diff — the change-detection readout q359's
    // manifests exist for: snapshot A (docs with doc_id % 10 <> 0, the
    // pre-ingest state) vs snapshot B (all docs), compared source by
    // source on (count, xor digest) without diffing any rows. Sources
    // whose digests agree are PROVEN unchanged (same leaves); the diff
    // lists only the touched partitions — the incremental-refresh
    // planning input. One map pass + one keyed groupBy with both
    // snapshots' aggregates in the same pass (a CASE side, not a second
    // scan).
    "q362_manifest_diff" -> ((s, d) => {
      val leaves = t(s, d, "documents")
        .select(col("source"), (col("doc_id") % 10 =!= 0).as("in_a"),
          graft.streaming.StreamingManifest
            .leafCol(col("doc_id"), col("text")).as("leaf"))
      leaves.groupBy("source")
        .agg(sum(when(col("in_a"), 1L).otherwise(0L)).as("n_a"),
          count(lit(1)).as("n_b"),
          expr("bit_xor(CASE WHEN in_a THEN leaf ELSE 0L END)").as("digest_a"),
          expr("bit_xor(leaf)").as("digest_b"))
        .select(col("source"), col("n_a"), col("n_b"), col("digest_a"),
          col("digest_b"),
          (col("digest_a") =!= col("digest_b")).as("changed"))
    }),


    // SimHash near-duplicate pairing — completes the SimHash path (q60
    // only emits fingerprints): Charikar-style 60-bit sketches matched
    // by 4×15-bit Hamming-LSH bands (any shared band pairs the docs),
    // bucket occupancy capped at 64, exact bit_count Hamming cut at
    // ≤ 6 — the q355 banded-join shape over the q60 population. Scale
    // shape: map-side sketch, one (band, key) shuffle, capped buckets;
    // a corpus-scale build widens the sketch with n (the q356 posture).
    "q361_simhash_neardup" -> ((s, d) => {
      Dedup.hammingBandPairs(
        Dedup.simhashRows(
          t(s, d, "documents").where(col("doc_id") < 300), "doc_id", "text"),
        "doc", "sim", nBands = 4, bandBits = 15, cap = 64, maxHamming = 6)
    }),


    // MAUVE-shape distributional eval (Pillutla et al. NeurIPS 2021's
    // quantize-then-compare recipe, with JS divergence in place of the
    // frontier integral): quantize both corpora into the shared IVF
    // codebook's cells, then compare the two cell HISTOGRAMS — here the
    // even/odd vec_id halves standing in for model-vs-human text. Uses
    // q278's exact integer convention (per-cell contributions floored
    // to e9 before the sum, so the aggregate is merge-order-free).
    // Scale shape: one broadcast cell assignment + one bounded-domain
    // groupBy; the histogram frame is #cells rows.
    "q360_mauve_cells" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val counts = e
        .join(Similarity.withIvfCell(e, Similarity.ivfCentroids(e)), "vec_id")
        .groupBy("cell")
        .agg(sum(when(col("vec_id") % 2 === 0, 1L).otherwise(0L)).as("cp"),
          sum(when(col("vec_id") % 2 =!= 0, 1L).otherwise(0L)).as("cq"))
      val tot = counts.agg(sum("cp").as("np"), sum("cq").as("nq"))
      val p = col("cp").cast("double") / col("np").cast("double")
      val q = col("cq").cast("double") / col("nq").cast("double")
      val m = (p + q) / lit(2.0)
      counts.crossJoin(broadcast(tot))
        .select(
          when(col("cp") > 0, floor(p * log(p / m) * 1e9).cast("long"))
            .otherwise(0L).as("tp"),
          when(col("cq") > 0, floor(q * log(q / m) * 1e9).cast("long"))
            .otherwise(0L).as("tq"))
        .agg(count(lit(1)).as("n_cells"), sum("tp").as("klp_e9"),
          sum("tq").as("klq_e9"))
        .withColumn("jsd2_e9", col("klp_e9") + col("klq_e9"))
    }),


    // Content-addressed dataset manifest — the Merkle-style snapshot
    // fingerprint a dataset-versioning layer (DVC/lakeFS posture, and
    // the audit twin of q245's TxTable) computes to detect ANY changed
    // row between two snapshots without diffing them: per-doc leaf =
    // 60-bit hash of (doc_id : content-md5); per-source digest =
    // bit_xor of leaves (order-independent, overflow-free — a modular
    // SUM would wrap int64 at a handful of 2^60 leaves); root = hash of
    // the source digests concatenated in sorted order. Scale shape: one
    // map pass + one keyed groupBy; the root combines #sources rows
    // (bounded domain, the q322 convention).
    "q359_merkle_manifest" -> ((s, d) => {
      val leaves = t(s, d, "documents")
        .select(col("source"),
          graft.streaming.StreamingManifest
            .leafCol(col("doc_id"), col("text")).as("leaf"))
      val perSource = leaves.groupBy("source")
        .agg(count(lit(1)).as("n_docs"), expr("bit_xor(leaf)").as("digest"))
      // sort by the SOURCE key, not the combined string: ':' (0x3a)
      // outranks digits, so sorting "src1:..." strings would order
      // src10 before src1 — unlike ORDER BY source.
      val root = perSource
        .agg(sum("n_docs").as("n_docs"),
          TextFunctions.hash60(array_join(transform(
            sort_array(collect_list(struct(col("source"),
              concat(col("source"), lit(":"), col("digest").cast("string"))
                .as("s")))),
            x => x.getField("s")), "|")).as("digest"))
        .select(lit("(ALL)").as("part"), col("n_docs"), col("digest"))
      perSource.select(col("source").as("part"), col("n_docs"), col("digest"))
        .unionAll(root)
    }),


    // Weak-supervision labeling-function diagnostics (the Snorkel/
    // data-programming LF report — Ratner et al. VLDB 2018): three
    // heuristic labelers vote keep(1)/drop(0)/abstain(null) per doc
    // (keyword presence, token-count bounds, integer mean-token-length
    // band), the per-doc label is the majority among non-abstainers,
    // and the report is per-LF coverage / majority-agreement / conflict
    // — the table a practitioner reads to decide which heuristic to
    // fix. Exact integers (rates as e6 trunc divisions). Scale shape:
    // one map pass, a 3-row explode per doc, one groupBy on the LF
    // name (3 groups).
    // Dawid–Skene EM label aggregation (1979; the crowd-labeling
    // standard): learn each labeling function's sensitivity and
    // specificity AND the per-item posterior jointly, instead of
    // q358's one-rater-one-vote majority — the aggregation that stops
    // a confidently-wrong rater from dragging the consensus. Same
    // three LFs as q358 (lf1/lf2 abstain, lf3 always votes);
    // posteriors init at the majority share, then 2 EM rounds in
    // exact e6 integers: M-step = posterior-weighted confusion sums
    // (one scan each), E-step = an unrolled 3-vote product chain with
    // one trunc-div per factor — the doremi convention, replayed
    // bit-for-bit by the oracle's unrolled CTE rounds. Scale: each
    // round is one map pass + one 7-sum aggregate; the 6 learned
    // scalars broadcast.
    "q454_dawid_skene" -> ((s, d) => {
      val base = t(s, d, "documents")
        .select(col("doc_id"), lower(col("text")).as("tl"),
          size(TextFunctions.tokens(col("text"))).cast("long").as("n_ws"),
          length(col("text")).cast("long").as("n_ch"))
        .withColumn("v1",
          when(col("tl").contains("spark") || col("tl").contains("fast"), 1L)
            .when(col("tl").contains("slow"), 0L))
        .withColumn("v2",
          when(col("n_ws") > 150L, 1L).when(col("n_ws") < 30L, 0L))
        .withColumn("v3",
          when(expr("(n_ch * 10) div n_ws").between(40L, 80L), 1L)
            .otherwise(0L))
        .select(col("doc_id"), col("v1"), col("v2"), col("v3"))
        .withColumn("nv", expr(
          """cast(v1 is not null as long) + cast(v2 is not null as long)
             + cast(v3 is not null as long)"""))
        .withColumn("p", expr(
          """CASE WHEN nv > 0 THEN (coalesce(v1, 0L) + coalesce(v2, 0L)
               + coalesce(v3, 0L)) * 1000000 div nv
             ELSE 500000 END"""))
        .persist() // re-scanned once per EM round
      var cur = base
      for (_ <- 1 to 2) {
        // M-step: posterior-weighted confusion sums per rater
        val m = cur.agg(count(lit(1)).as("n"), sum("p").as("sp"),
          sum(expr("CASE WHEN v1 = 1 THEN p ELSE 0 END")).as("a1"),
          sum(expr("CASE WHEN v1 IS NOT NULL THEN p ELSE 0 END")).as("b1"),
          sum(expr("CASE WHEN v1 = 0 THEN 1000000 - p ELSE 0 END")).as("c1"),
          sum(expr("CASE WHEN v1 IS NOT NULL THEN 1000000 - p ELSE 0 END"))
            .as("e1"),
          sum(expr("CASE WHEN v2 = 1 THEN p ELSE 0 END")).as("a2"),
          sum(expr("CASE WHEN v2 IS NOT NULL THEN p ELSE 0 END")).as("b2"),
          sum(expr("CASE WHEN v2 = 0 THEN 1000000 - p ELSE 0 END")).as("c2"),
          sum(expr("CASE WHEN v2 IS NOT NULL THEN 1000000 - p ELSE 0 END"))
            .as("e2"),
          sum(expr("CASE WHEN v3 = 1 THEN p ELSE 0 END")).as("a3"),
          sum(expr("CASE WHEN v3 IS NOT NULL THEN p ELSE 0 END")).as("b3"),
          sum(expr("CASE WHEN v3 = 0 THEN 1000000 - p ELSE 0 END")).as("c3"),
          sum(expr("CASE WHEN v3 IS NOT NULL THEN 1000000 - p ELSE 0 END"))
            .as("e3"))
          .select(expr("sp div n").as("pi"),
            expr("a1 * 1000000 div greatest(b1, 1L)").as("sen1"),
            expr("c1 * 1000000 div greatest(e1, 1L)").as("spe1"),
            expr("a2 * 1000000 div greatest(b2, 1L)").as("sen2"),
            expr("c2 * 1000000 div greatest(e2, 1L)").as("spe2"),
            expr("a3 * 1000000 div greatest(b3, 1L)").as("sen3"),
            expr("c3 * 1000000 div greatest(e3, 1L)").as("spe3"))
        // E-step: unrolled 3-vote product chain, one trunc-div per factor
        def lik(v: String, sen: String, spe: String, yes: Boolean) =
          if (yes)
            s"""(CASE WHEN $v IS NULL THEN 1000000
                 WHEN $v = 1 THEN $sen ELSE 1000000 - $sen END)"""
          else
            s"""(CASE WHEN $v IS NULL THEN 1000000
                 WHEN $v = 0 THEN $spe ELSE 1000000 - $spe END)"""
        cur = cur.drop("p").crossJoin(broadcast(m))
          .withColumn("la", expr(
            s"""((pi * ${lik("v1", "sen1", "spe1", yes = true)} div 1000000)
               * ${lik("v2", "sen2", "spe2", yes = true)} div 1000000)
               * ${lik("v3", "sen3", "spe3", yes = true)} div 1000000"""))
          .withColumn("lb", expr(
            s"""(((1000000 - pi)
               * ${lik("v1", "sen1", "spe1", yes = false)} div 1000000)
               * ${lik("v2", "sen2", "spe2", yes = false)} div 1000000)
               * ${lik("v3", "sen3", "spe3", yes = false)} div 1000000"""))
          .withColumn("p", expr(
            """CASE WHEN la + lb > 0 THEN la * 1000000 div (la + lb)
               ELSE 500000 END"""))
          .select(col("doc_id"), col("v1"), col("v2"), col("v3"),
            col("nv"), col("p"))
          .localCheckpoint(true)
      }
      val fin = cur.agg(count(lit(1)).as("n_items"), sum("p").as("sp"),
        sum(expr("""CASE WHEN (p >= 500000) !=
            ((coalesce(v1, 0L) + coalesce(v2, 0L) + coalesce(v3, 0L)) * 2
              >= greatest(nv, 1L)) THEN 1 ELSE 0 END""")).as("n_flipped"))
      val m2 = cur.agg(
        sum(expr("CASE WHEN v1 = 1 THEN p ELSE 0 END")).as("a1"),
        sum(expr("CASE WHEN v1 IS NOT NULL THEN p ELSE 0 END")).as("b1"),
        sum(expr("CASE WHEN v2 = 1 THEN p ELSE 0 END")).as("a2"),
        sum(expr("CASE WHEN v2 IS NOT NULL THEN p ELSE 0 END")).as("b2"),
        sum(expr("CASE WHEN v3 = 1 THEN p ELSE 0 END")).as("a3"),
        sum(expr("CASE WHEN v3 IS NOT NULL THEN p ELSE 0 END")).as("b3"))
        .select(expr("a1 * 1000000 div greatest(b1, 1L)").as("sen1_e6"),
          expr("a2 * 1000000 div greatest(b2, 1L)").as("sen2_e6"),
          expr("a3 * 1000000 div greatest(b3, 1L)").as("sen3_e6"))
      fin.crossJoin(broadcast(m2))
        .select(col("n_items"), expr("sp div n_items").as("pi_e6"),
          col("n_flipped"), col("sen1_e6"), col("sen2_e6"), col("sen3_e6"))
    }),

    "q358_weak_supervision" -> ((s, d) => {
      val base = t(s, d, "documents")
        .select(col("doc_id"), lower(col("text")).as("tl"),
          size(TextFunctions.tokens(col("text"))).cast("long").as("n_ws"),
          length(col("text")).cast("long").as("n_ch"))
        .withColumn("lf1",
          when(col("tl").contains("spark") || col("tl").contains("fast"), 1L)
            .when(col("tl").contains("slow"), 0L))
        .withColumn("lf2",
          when(col("n_ws") > 150L, 1L).when(col("n_ws") < 30L, 0L))
        .withColumn("lf3",
          when(expr("(n_ch * 10) div n_ws").between(40L, 80L), 1L)
            .otherwise(0L))
      def isv(c: String, v: Long) =
        when(col(c) === v, 1L).otherwise(0L)
      val maj = base
        .withColumn("v1", isv("lf1", 1L) + isv("lf2", 1L) + isv("lf3", 1L))
        .withColumn("v0", isv("lf1", 0L) + isv("lf2", 0L) + isv("lf3", 0L))
        .withColumn("maj",
          when(col("v1") > col("v0"), 1L).when(col("v0") > col("v1"), 0L))
      maj.select(col("maj"), explode(array(
          struct(lit("lf_keyword").as("lf"), col("lf1").as("v")),
          struct(lit("lf_length").as("lf"), col("lf2").as("v")),
          struct(lit("lf_meanlen").as("lf"), col("lf3").as("v")))).as("x"))
        .select(col("x.lf").as("lf"), col("x.v").as("v"), col("maj"))
        .groupBy("lf")
        .agg(count(lit(1)).as("n_docs"),
          count(col("v")).as("n_votes"),
          sum(when(col("v") === col("maj"), 1L).otherwise(0L)).as("n_agree"),
          sum(when(col("v").isNotNull && col("maj").isNotNull &&
              col("v") =!= col("maj"), 1L).otherwise(0L)).as("n_conflict"),
          sum(when(col("v").isNotNull && col("maj").isNotNull, 1L)
            .otherwise(0L)).as("n_lab"))
        .select(col("lf"), col("n_docs"), col("n_votes"),
          expr("n_votes * 1000000 div n_docs").as("coverage_e6"),
          col("n_agree"), col("n_conflict"),
          when(col("n_lab") > 0L, expr("n_agree * 1000000 div n_lab"))
            .otherwise(0L).as("agree_e6"))
    }),


    // Margin-ratio pair scoring (Artetxe & Schwenk ACL 2019) — the
    // published bitext-mining acceptance criterion on top of the
    // q321/q347 candidate stage: cos(x,y) against the mean of each
    // side's top-4 in-cell neighborhood, accepted when the ratio
    // exceeds 1.0 (hubs score ~1 and drop; isolated true matches score
    // above). Exact e6-integer replay; corpus-scaled (cell, bin)
    // groups; see Similarity.marginRatio for the scale notes.
    "q352_margin_ratio" -> ((s, d) => {
      Similarity.marginRatio(t(s, d, "embeddings"), 200L, 4)
        .where(col("margin_e6") >= 1000000L)
    }),


    // TrustRank (Gyöngyi et al. 2004) over the LSH near-dup graph:
    // personalized PageRank with the restart mass pinned to a trusted
    // seed set (doc_id < 20) — the seeded quality-propagation pass a web
    // corpus curator runs to score unlabeled pages by proximity to
    // vetted ones. Three power-iteration rounds replayed entirely in e6
    // integer micro-units with trunc divisions (the q292/q132
    // convention), so a SQL oracle unrolls every round bit-for-bit.
    // Scale shape: each round is one edge-keyed join + groupBy (fan-in
    // = degree) against the persisted seed frame; nothing global, no
    // driver-side state.
    "q324_trustrank" -> ((s, d) => {
      val pairs = Dedup.lshCandidatePairs(
        t(s, d, "documents").where(col("doc_id") < 300), "doc_id", "text")
      val edges = pairs.select(col("id1").as("src"), col("id2").as("dst"))
        .unionAll(pairs.select(col("id2").as("src"), col("id1").as("dst")))
        .persist() // degree count + one probe per iteration round
      val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      val nodes = deg.select(col("src").as("node"), col("deg"),
        (col("src") < 20L).as("is_seed"))
      val nSeeds = nodes.agg(
        sum(when(col("is_seed"), 1L).otherwise(0L)).as("ns"))
      val seedBase = nodes.crossJoin(broadcast(nSeeds))
        .select(col("node"), col("deg"), col("is_seed"),
          when(col("is_seed"), expr("1000000 div ns")).otherwise(0L)
            .as("s_e6"))
        .persist() // restart vector re-read every round + final join
      var v = seedBase.select(col("node"), col("s_e6").as("v_e6"))
      val rounds = 3
      for (r <- 1 to rounds) {
        val inflow = edges
          .join(v, col("src") === col("node"))
          .join(deg, "src")
          .select(col("dst"), expr("v_e6 div deg").as("contrib"))
          .groupBy("dst").agg(sum("contrib").as("inflow"))
        val next = seedBase.join(inflow, col("node") === col("dst"), "left")
          .na.fill(0L, Seq("inflow"))
          .select(col("node"),
            expr("(15 * s_e6) div 100 + (85 * inflow) div 100").as("v_e6"))
        // generation cut (q132/q185 lesson): without it each round
        // re-plans the accumulated lineage and the LSH pair subtree
        // dominates — measured 18.6 s → expected ~2 s at sf1 where the
        // doc_id<300 graph itself is constant-size. The LAST round skips
        // the cut: its only consumer is the final join, which runs once —
        // an eager materialization there is a whole extra pass (r14:
        // each eager cut is ~5 AQE sub-jobs of pure scheduling floor).
        v = if (r < rounds) next.localCheckpoint(true) else next
      }
      seedBase
        .join(v.withColumnRenamed("v_e6", "trust_e6"), Seq("node"))
        .select(col("node").as("doc_id"), col("deg"), col("is_seed"),
          col("trust_e6"))
    }),


    // UMass topic coherence (Mimno et al. 2011) of each source's top-5
    // document-frequency terms: Σ_{l<m} ln((D(w_m,w_l)+1)/D(w_l)) over
    // the rank-ordered pairs — the intrinsic "do these terms co-occur"
    // readout a topic/cluster pipeline runs on its keyword lists (q313
    // RAKE, q83 TF-IDF). Each pair's log term is e9-floored BEFORE the
    // sum (the q278 rule), so the aggregate is merge-order-free. Scale
    // shape: doc-frequency is one groupBy; the top-k window keys per
    // source; the co-document self-join runs only over docs' TOP-TERM
    // postings (left_semi prefilter), with fan-in ≤ k per doc.
    "q326_umass_coherence" -> ((s, d) => {
      val dt = t(s, d, "documents")
        .select(col("source"), col("doc_id"),
          explode(array_distinct(TextFunctions.tokens(col("text"))))
            .as("term"))
        .persist() // df counts + the co-doc self-join both read it
      val dfr = dt.groupBy("source", "term").agg(count(lit(1)).as("df"))
      val wR = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(desc("df"), asc("term"))
      val top = dfr.withColumn("rk", row_number().over(wR).cast("long"))
        .where(col("rk") <= 5)
        .persist() // pair frame (twice) + postings prefilter
      val dtop = dt.join(top.select("source", "term"),
        Seq("source", "term"), "left_semi")
      val co = dtop.select(col("source"), col("doc_id"), col("term").as("t1"))
        .join(dtop.select(col("source"), col("doc_id"), col("term").as("t2")),
          Seq("source", "doc_id"))
        .where(col("t1") < col("t2"))
        .groupBy("source", "t1", "t2").agg(count(lit(1)).as("d12"))
      val lo = top.select(col("source"), col("term").as("wl"),
        col("rk").as("l"), col("df").as("dfl"))
      val hi = top.select(col("source"), col("term").as("wm"),
        col("rk").as("m"))
      lo.join(hi, "source").where(col("l") < col("m"))
        .withColumn("t1", least(col("wl"), col("wm")))
        .withColumn("t2", greatest(col("wl"), col("wm")))
        .join(co, Seq("source", "t1", "t2"), "left")
        .na.fill(0L, Seq("d12"))
        .select(col("source"),
          floor(log((col("d12") + lit(1L)).cast("double") /
            col("dfl").cast("double")) * 1e9).cast("long").as("term_e9"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_pairs"), sum("term_e9").as("coherence_e9"))
    }),


    // Burrows' Delta (2002) stylometric distance between every source
    // pair: per-source relative frequencies of the corpus top-20 terms,
    // z-scored per term across sources, delta = Σ_t |z_a − z_b| — and
    // since the per-term mean cancels in the difference, each term
    // contributes |f_a − f_b|/σ_t directly. Frequencies are exact e6
    // integer shares, σ² is the exact integer moment chain
    // (n·Σf²−(Σf)²)/n², and each term's contribution is floored to e6
    // BEFORE the sum (merge-order-free, the q278 rule). The
    // authorship/provenance-attribution readout over q83's TF machinery.
    // Scale shape: one corpus token scan; everything after runs on the
    // #sources × 20 grid with the top-term and per-source-total frames
    // broadcast — the pair join fan-in is #sources per term, not rows.
    "q328_burrows_delta" -> ((s, d) => {
      val tok = t(s, d, "documents").select(col("source"),
        explode(TextFunctions.tokens(col("text"))).as("term"))
      val st = tok.groupBy("source", "term").agg(count(lit(1)).as("c"))
        .persist() // source totals + top-term probe both read it
      val srcTot = st.groupBy("source").agg(sum("c").as("tot"))
      val top = st.groupBy("term").agg(sum("c").as("gc"))
        .orderBy(desc("gc"), asc("term")).limit(20)
      val f = st.join(broadcast(top.select("term")), "term")
        .join(broadcast(srcTot), "source")
        .select(col("source"), col("term"),
          expr("(c * 1000000) div tot").as("f_e6"))
      val grid = srcTot.select("source")
        .crossJoin(broadcast(top.select("term")))
        .join(f, Seq("source", "term"), "left")
        .na.fill(0L, Seq("f_e6"))
        .persist() // per-term moments + both pair sides read it
      val sigma = grid.groupBy("term").agg(count(lit(1)).as("ns"),
          sum("f_e6").as("sf"), sum(col("f_e6") * col("f_e6")).as("sff"))
        .select(col("term"),
          ((col("ns") * col("sff") - col("sf") * col("sf")).cast("double") /
            (col("ns") * col("ns")).cast("double")).as("v"))
        .where(col("v") > 0.0)
      val a = grid.select(col("source").as("src_a"), col("term"),
        col("f_e6").as("fa"))
      val b = grid.select(col("source").as("src_b"), col("term"),
        col("f_e6").as("fb"))
      a.join(b, "term").where(col("src_a") < col("src_b"))
        .join(broadcast(sigma), "term")
        .select(col("src_a"), col("src_b"),
          floor(abs(col("fa") - col("fb")).cast("double") / sqrt(col("v"))
            * 1e6).cast("long").as("t_e6"))
        .groupBy("src_a", "src_b")
        .agg(count(lit(1)).as("n_terms"), sum("t_e6").as("delta_sum_e6"))
    }),


    // word2vec-style negative sampling (Mikolov et al. 2013) with an
    // exact integer cumulative table: unigram weights c^(3/4) computed
    // as floor(sqrt(c·sqrt(c))·1000) — sqrt is IEEE-CORRECTLY-ROUNDED
    // in both engines (pow/exp/ln are not), so the 3/4 power carries no
    // libm knife edge — cumulative [lo, hi) ranges built with the
    // distributed PrefixScan (no single-partition window over the
    // vocab), and each (doc, pos, j) draw mapped into the table by a
    // 60-bit md5 hash mod total weight: seeded, reproducible, and
    // SQL-replayable. Output: per-term draw counts vs target weight,
    // the sampler's empirical-vs-target readout. Scale shape: one token
    // scan, the PrefixScan two-phase ranged cumsum, and an EQUI-join
    // probe: the cumulative axis is cut into fixed-stride cells, each
    // [lo, hi) range explodes onto the cells it spans (wtot/stride + V
    // rows, still broadcast-sized), a draw hashes to cell h div stride,
    // and the range check is a post-filter on the hash-joined cell — a
    // BroadcastHashJoin, not the O(draws x vocab) nested-loop probe the
    // raw range predicate would plan. Draws never shuffle.
    "q331_negative_sampling" -> ((s, d) => {
      val stride = 1000000L // ~1k tokens' weight per cell
      val tok = t(s, d, "documents").select(col("doc_id"),
        posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "term")))
      val vocab = tok.groupBy("term").agg(count(lit(1)).as("c"))
        .withColumn("w", floor(sqrt(col("c").cast("double") *
          sqrt(col("c").cast("double"))) * 1000).cast("long"))
      val ranges = graft.operators.PrefixScan.scanLong(
          vocab, "hi", "w", "sum", inclusive = true, asc("term"))
        .withColumn("lo", col("hi") - col("w"))
      val tot = ranges.agg(max("hi").as("wtot"))
      val cells = ranges.where(col("w") > 0)
        .select(col("term").as("neg"), col("lo"), col("hi"), col("w"),
          explode(sequence(expr(s"lo div $stride"),
            expr(s"(hi - 1) div $stride"))).as("cell"))
      val draws = tok.where(col("pos") < 5)
        .withColumn("j", explode(array(lit(1L), lit(2L))))
        .crossJoin(broadcast(tot))
        .withColumn("h", pmod(TextFunctions.hash60(
          concat_ws(":", col("doc_id"), col("pos"), col("j"))), col("wtot")))
        .withColumn("cell", expr(s"h div $stride"))
      draws.join(broadcast(cells), "cell")
        .where(col("h") >= col("lo") && col("h") < col("hi"))
        .groupBy("neg", "w").agg(count(lit(1)).as("n_draws"))
    }),


    // Good–Turing count re-estimation (the classical LM smoother next
    // to q258's Kneser–Ney): adjusted count c* = (c+1)·N_{c+1}/N_c from
    // the count-of-counts table, reported for c ≤ 5 where the estimator
    // is meaningful — exact e6 integer division, the N_{c+1} lookup is
    // a self-join on the tiny count-of-counts frame. Scale shape: one
    // token groupBy, one count-of-counts groupBy (domain = distinct
    // counts), one keyed join on that bounded frame.
    "q333_good_turing" -> ((s, d) => {
      val tc = t(s, d, "documents")
        .select(explode(TextFunctions.tokens(col("text"))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("c"))
      val coc = tc.groupBy("c").agg(count(lit(1)).as("n_c"))
      val next = coc.select((col("c") - 1L).as("c"), col("n_c").as("n_c1"))
      coc.join(next, Seq("c"), "left")
        .where(col("c") <= 5)
        .withColumn("n_c1", coalesce(col("n_c1"), lit(0L)))
        .select(col("c"), col("n_c"), col("n_c1"),
          expr("((c + 1) * n_c1 * 1000000) div n_c").as("c_star_e6"))
    }),


    // Brier reliability bins — q164's calibration table upgraded with
    // the forecast mean, the calibration gap, and the per-bin Brier
    // contribution: forecast p = (emb[0]+1)/2 in e3 milli-units (the
    // per-row squared error (p−o)² then fits int64 to ~10¹² rows),
    // outcome = label parity, deciles of p. f̄, ō, and the gap are
    // trunc e3 integer divisions; the Brier sum is an exact integer.
    // One map-side-combinable groupBy — nothing wider than 10 bins.
    "q334_brier_bins" -> ((s, d) => {
      val p = expr("""greatest(0L, least(1000L,
        cast(floor((CAST(embedding[0] AS DOUBLE) + 1.0) / 2.0 * 1000) as bigint)))""")
      t(s, d, "embeddings")
        .select(p.as("p_e3"), (col("label") % 2 === 1).as("pos"))
        .withColumn("o_e3", when(col("pos"), 1000L).otherwise(0L))
        .groupBy(expr("least(p_e3 div 100, 9L)").as("bucket"))
        .agg(count(lit(1)).as("n"),
          sum("p_e3").as("sp_e3"),
          sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"),
          sum((col("p_e3") - col("o_e3")) * (col("p_e3") - col("o_e3")))
            .as("brier_sum_e6"))
        .select(col("bucket"), col("n"), col("sp_e3"), col("n_pos"),
          expr("sp_e3 div n").as("fbar_e3"),
          expr("(n_pos * 1000) div n").as("obar_e3"),
          expr("sp_e3 div n - (n_pos * 1000) div n").as("gap_e3"),
          col("brier_sum_e6"))
    }),


    // ROC curve points at decile thresholds — the curve behind q155's
    // scalar AUC: score-bucket the corpus once, then TP/FP at each cut
    // are descending cumulative sums over the 11-row bucket frame (a
    // deliberately bounded single-partition window, like every ≤100-row
    // top-k form here), with TPR/FPR as exact e6 divisions against the
    // broadcast class totals. One groupBy shuffles; the sweep itself
    // touches 11 rows.
    "q337_roc_points" -> ((s, d) => {
      val per = t(s, d, "embeddings")
        .select(expr("""cast(floor((CAST(embedding[0] AS DOUBLE) + 1.0)
            / 2.0 * 10) as bigint)""").as("bkt"),
          (col("label") % 2 === 1).as("pos"))
        .groupBy("bkt")
        .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("np"),
          sum(when(!col("pos"), 1L).otherwise(0L)).as("nn"))
      val tot = per.agg(sum("np").as("p_tot"), sum("nn").as("n_tot"))
      val w = org.apache.spark.sql.expressions.Window.orderBy(desc("bkt"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      per.withColumn("tp", sum("np").over(w))
        .withColumn("fp", sum("nn").over(w))
        .crossJoin(broadcast(tot))
        .select(col("bkt").as("threshold_bkt"), col("tp"), col("fp"),
          expr("(tp * 1000000) div p_tot").as("tpr_e6"),
          expr("(fp * 1000000) div n_tot").as("fpr_e6"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q405_lsh_param_tuner" -> lshTunerOracle,

    "q406_bradley_terry" -> bradleyTerryOracle,

    "q410_kcenter_coreset" -> kcenterOracle,

    "q420_dedup_mixture_shift" ->
      s"""WITH RECURSIVE $minhashCtes,
         $componentCtes,
         keep AS (
           SELECT d.source,
             CAST(len(string_split(lower(d.text), ' ')) AS BIGINT) AS nt,
             coalesce(r.rep_id, d.doc_id) = d.doc_id AS is_kept
           FROM documents d LEFT JOIN rep r USING (doc_id)
           WHERE d.doc_id < 300),
         g AS (
           SELECT source, count(*) AS n_docs,
             CAST(sum(CASE WHEN is_kept THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
             CAST(sum(nt) AS BIGINT) AS tok_before,
             CAST(sum(CASE WHEN is_kept THEN nt ELSE 0 END) AS BIGINT)
               AS tok_after
           FROM keep GROUP BY 1),
         tot AS (
           SELECT CAST(sum(tok_before) AS BIGINT) AS tb,
             CAST(sum(tok_after) AS BIGINT) AS ta
           FROM g)
         SELECT source, n_docs, n_kept, tok_before, tok_after,
           tok_before * 1000000 // tb AS share_before_e6,
           tok_after * 1000000 // ta AS share_after_e6,
           tok_after * 1000000 // ta - tok_before * 1000000 // tb
             AS shift_e6
         FROM g, tot""",

    "q421_containment" ->
      s"""WITH $minhashCtes,
         cpairs AS (
           SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         shc AS (
           SELECT doc_id,
             list_distinct(list_transform(range(1, len(w) - 1),
               i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))) AS shs
           FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
                 FROM documents WHERE doc_id < 300)
           WHERE len(w) >= 3),
         j AS (
           SELECT c.id1, c.id2,
             CAST(len(list_intersect(a.shs, b.shs)) AS BIGINT) AS inter,
             CAST(len(a.shs) AS BIGINT) AS l1,
             CAST(len(b.shs) AS BIGINT) AS l2
           FROM cpairs c JOIN shc a ON c.id1 = a.doc_id
             JOIN shc b ON c.id2 = b.doc_id)
         SELECT id1, id2, inter, l1, l2,
           inter * 1000000 // (l1 + l2 - inter) AS jaccard_e6,
           inter * 1000000 // l1 AS cont_1in2_e6,
           inter * 1000000 // l2 AS cont_2in1_e6,
           greatest(inter * 1000000 // l1, inter * 1000000 // l2) >= 800000
             AND inter * 1000000 // (l1 + l2 - inter) < 500000 AS asymmetric
         FROM j""",

    "q408_packing_efficiency" ->
      """WITH nt AS (
           SELECT doc_id,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS nt
           FROM documents
           WHERE len(string_split(lower(text), ' ')) > 0),
         cum AS (
           SELECT doc_id, nt,
             CAST(sum(nt) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum
           FROM nt),
         g AS (SELECT CAST(unnest([512, 2048]) AS BIGINT) AS l),
         x AS (
           SELECT l, nt, cum, (cum - 1) // l - (cum - nt) // l AS crossed
           FROM cum CROSS JOIN g)
         SELECT l, count(*) AS n_docs,
           CAST(sum(CASE WHEN crossed > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_split,
           CAST(sum(CASE WHEN crossed > 0 THEN 1 ELSE 0 END) AS BIGINT)
             * 1000000 // count(*) AS split_frac_e6,
           CAST(sum(crossed) AS BIGINT) AS n_crossings,
           max(cum) AS total_tokens,
           (max(cum) + l - 1) // l AS n_windows,
           ((max(cum) + l - 1) // l) * l - max(cum) AS tail_pad_tokens
         FROM x GROUP BY l""",

    "q352_margin_ratio" -> marginRatioOracle(200L, 4),


    "q377_cdc_savings" ->
      s"""WITH toks374 AS (
           SELECT doc_id, pos - 1 AS pos, tok,
             CASE WHEN ${h60("tok")} % 16 = 0 THEN 1 ELSE 0 END AS cut
           FROM (
             SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok,
               generate_subscripts(string_split(lower(text), ' '), 1) AS pos
             FROM documents WHERE doc_id < 300)),
         cids AS (
           SELECT doc_id, pos, tok,
             CAST(coalesce(sum(cut) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS chunk_id
           FROM toks374),
         chunks AS (
           SELECT doc_id, chunk_id, count(*) AS chunk_len,
             md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_fp
           FROM cids GROUP BY 1, 2),
         per_fp AS (
           SELECT chunk_fp, count(*) AS n_copies,
             CAST(min(chunk_len) AS BIGINT) AS len
           FROM chunks GROUP BY 1)
         SELECT CAST(sum(n_copies * len) AS BIGINT) AS total_tok,
           CAST(sum((n_copies - 1) * len) AS BIGINT) AS dup_tok,
           count(*) AS n_unique_chunks,
           CAST(sum((n_copies - 1) * len) AS BIGINT) * 1000000
             // CAST(sum(n_copies * len) AS BIGINT) AS savings_e6
         FROM per_fp""",


    "q375_centroid_drift" ->
      """WITH q AS (
           SELECT CAST(label AS BIGINT) AS lab, vec_id % 2 = 0 AS even,
             generate_subscripts(embedding, 1) - 1 AS dim,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0)
               AS BIGINT) AS v
           FROM embeddings),
         cent AS (
           SELECT lab, even, dim,
             CAST(sum(v) // count(*) AS BIGINT) AS c, count(*) AS n
           FROM q GROUP BY 1, 2, 3),
         p AS (
           SELECT lab, dim,
             max(CASE WHEN even THEN c END) AS ce,
             max(CASE WHEN NOT even THEN c END) AS co,
             max(CASE WHEN even THEN n END) AS ne,
             max(CASE WHEN NOT even THEN n END) AS n_o
           FROM cent GROUP BY 1, 2)
         SELECT lab, CAST(max(ne) AS BIGINT) AS n_even,
           CAST(max(n_o) AS BIGINT) AS n_odd,
           CAST(sum((ce - co) * (ce - co)) AS BIGINT) AS dist2_e12
         FROM p GROUP BY lab""",


    "q376_novelty_curve" ->
      s"""WITH nmax AS (SELECT max(doc_id) AS max_id FROM documents),
         grams AS (
           SELECT least(9, doc_id * 10 // (max_id + 1)) AS dec,
             ${h60("g")} AS h
           FROM (
             SELECT doc_id,
               unnest(list_transform(range(1, len(w) - 1),
                 i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))) AS g
             FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
                   FROM documents)
             WHERE len(w) >= 3) CROSS JOIN nmax),
         per_dec AS (SELECT DISTINCT dec, h FROM grams),
         first_dec AS (SELECT h, min(dec) AS first_dec FROM per_dec GROUP BY h)
         SELECT dec, count(*) AS n_distinct,
           CAST(sum(CASE WHEN first_dec = dec THEN 1 ELSE 0 END) AS BIGINT)
             AS n_novel,
           CAST(sum(CASE WHEN first_dec = dec THEN 1 ELSE 0 END) AS BIGINT)
             * 1000000 // count(*) AS novelty_e6
         FROM per_dec JOIN first_dec USING (h)
         GROUP BY dec""",


    "q373_component_folds" ->
      s"""WITH RECURSIVE $minhashCtes,
         $componentCtes,
         comp AS (
           SELECT d.doc_id, coalesce(r.rep_id, d.doc_id) AS rep_id
           FROM (SELECT doc_id FROM documents WHERE doc_id < 300) d
           LEFT JOIN rep r USING (doc_id)),
         fold AS (
           SELECT doc_id, rep_id,
             ${h60("concat('fold:', rep_id)")} % 5 AS fold
           FROM comp),
         cpairs AS (
           SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         leaks AS (
           SELECT CAST(coalesce(sum(CASE WHEN fa.fold <> fb.fold THEN 1
             ELSE 0 END), 0) AS BIGINT) AS n_leaks
           FROM cpairs p
           JOIN fold fa ON p.id1 = fa.doc_id
           JOIN fold fb ON p.id2 = fb.doc_id)
         SELECT fold, count(*) AS n_docs,
           CAST(count(DISTINCT rep_id) AS BIGINT) AS n_components, n_leaks
         FROM fold CROSS JOIN leaks
         GROUP BY fold, n_leaks""",


    "q374_cdc_chunks" ->
      s"""WITH toks374 AS (
           SELECT doc_id, pos - 1 AS pos, tok,
             CASE WHEN ${h60("tok")} % 16 = 0 THEN 1 ELSE 0 END AS cut
           FROM (
             SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok,
               generate_subscripts(string_split(lower(text), ' '), 1) AS pos
             FROM documents WHERE doc_id < 300)),
         cids AS (
           SELECT doc_id, pos, tok,
             CAST(coalesce(sum(cut) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS chunk_id
           FROM toks374),
         chunks AS (
           SELECT doc_id, chunk_id, count(*) AS chunk_len,
             md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_fp
           FROM cids GROUP BY 1, 2),
         rn AS (
           SELECT *, row_number() OVER (PARTITION BY chunk_fp
             ORDER BY doc_id, chunk_id) AS r
           FROM chunks)
         SELECT chunk_fp, count(*) AS n_copies,
           CAST(min(chunk_len) AS BIGINT) AS chunk_len,
           max(CASE WHEN r = 1 THEN doc_id END) AS first_doc,
           max(CASE WHEN r = 1 THEN chunk_id END) AS first_chunk
         FROM rn GROUP BY chunk_fp
         HAVING count(*) > 1""",


    "q372_effective_tokens" ->
      s"""WITH RECURSIVE $minhashCtes,
         $componentCtes,
         d AS (
           SELECT doc_id, source,
             CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT)
               AS ntok,
             md5($normSql) AS fp
           FROM documents WHERE doc_id < 300),
         ek AS (
           SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1
             AS keep_exact
           FROM d),
         nk AS (
           SELECT d2.doc_id,
             coalesce(r.rep_id, d2.doc_id) = d2.doc_id AS keep_near
           FROM (SELECT doc_id FROM documents WHERE doc_id < 300) d2
           LEFT JOIN rep r USING (doc_id))
         SELECT source, count(*) AS n_docs,
           CAST(sum(ntok) AS BIGINT) AS raw_tok,
           CAST(sum(CASE WHEN keep_exact THEN ntok ELSE 0 END) AS BIGINT)
             AS exact_tok,
           CAST(sum(CASE WHEN keep_exact AND keep_near THEN ntok ELSE 0 END)
             AS BIGINT) AS near_tok,
           CAST(sum(CASE WHEN keep_exact THEN ntok ELSE 0 END) AS BIGINT)
             * 1000000 // CAST(sum(ntok) AS BIGINT) AS exact_retention_e6,
           CAST(sum(CASE WHEN keep_exact AND keep_near THEN ntok ELSE 0 END)
             AS BIGINT) * 1000000 // CAST(sum(ntok) AS BIGINT)
             AS near_retention_e6
         FROM ek JOIN nk USING (doc_id)
         GROUP BY source""",


    "q370_shuffle_skew_audit" ->
      s"""WITH b AS (
           SELECT ${h60("CAST(user_id AS VARCHAR)")} % 32 AS bucket,
             count(*) AS n
           FROM events GROUP BY 1),
         tot AS (
           SELECT CAST(sum(n) AS BIGINT) AS total, count(*) AS n_buckets,
             CAST(max(n) AS BIGINT) AS max_n
           FROM b)
         SELECT bucket, n, n * 1000000 // total AS share_e6,
           max_n * 1000 // (total // n_buckets) AS skew_e3
         FROM b CROSS JOIN tot""",


    "q369_join_cardinality" ->
      """WITH o AS (
           SELECT o_orderkey AS k, count(*) AS c1 FROM orders GROUP BY 1),
         l AS (
           SELECT l_orderkey AS k, count(*) AS c2 FROM lineitem GROUP BY 1),
         actual AS (
           SELECT CAST(sum(o.c1 * l.c2) AS BIGINT) AS actual_rows
           FROM o JOIN l USING (k)),
         stats AS (
           SELECT (SELECT CAST(sum(c1) AS BIGINT) FROM o) AS n1,
             (SELECT CAST(sum(c2) AS BIGINT) FROM l) AS n2,
             (SELECT count(*) FROM o) AS ndv1,
             (SELECT count(*) FROM l) AS ndv2)
         SELECT actual_rows, n1, n2, ndv1, ndv2,
           n1 * n2 // greatest(ndv1, ndv2) AS estimate_rows,
           (n1 * n2 // greatest(ndv1, ndv2)) * 1000000 // actual_rows
             AS est_over_actual_e6
         FROM actual CROSS JOIN stats""",


    "q367_dedup_keep_best" ->
      s"""WITH RECURSIVE $minhashCtes,
         $componentCtes,
         d AS (
           SELECT doc_id,
             CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT)
               AS ntok
           FROM documents WHERE doc_id < 300),
         f AS (
           SELECT d.doc_id, coalesce(r.rep_id, d.doc_id) AS rep_id, d.ntok
           FROM d LEFT JOIN rep r USING (doc_id)),
         b AS (
           SELECT rep_id, doc_id AS best_id FROM (
             SELECT *, row_number() OVER (PARTITION BY rep_id
               ORDER BY ntok DESC, doc_id) AS rn
             FROM f) WHERE rn = 1)
         SELECT f.doc_id, f.rep_id, f.ntok, b.best_id,
           f.doc_id = b.best_id AS is_kept
         FROM f JOIN b USING (rep_id)""",


    "q368_decayed_popularity" ->
      """WITH ev AS (
           SELECT event_id, event_type,
             CAST(floor(date_part('epoch', ts)) AS BIGINT) AS ts_s,
             CAST(floor(value * 1000) AS BIGINT) AS v_e3
           FROM events),
         anchor AS (SELECT max(ts_s) AS now_s FROM ev),
         scored AS (
           SELECT event_type, event_id,
             (now_s - ts_s) // 604800 AS age_weeks,
             CASE WHEN (now_s - ts_s) // 604800 >= 63 THEN 0
                  ELSE v_e3 >> CAST((now_s - ts_s) // 604800 AS INT)
             END AS decayed_e3
           FROM ev CROSS JOIN anchor)
         SELECT event_type, event_id, age_weeks,
           CAST(decayed_e3 AS BIGINT) AS decayed_e3,
           CAST(rnk AS BIGINT) AS rnk
         FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                 ORDER BY decayed_e3 DESC, event_id) AS rnk
               FROM scored)
         WHERE rnk <= 10""",


    "q366_lsh_s_curve" ->
      s"""WITH $minhashCtes,
         cpairs AS MATERIALIZED (
           SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         sh100 AS (
           SELECT doc_id,
             list_distinct(list_transform(range(1, len(w) - 1),
               i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))) AS shs
           FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
                 FROM documents WHERE doc_id < 300)
           WHERE len(w) >= 3),
         allp AS (
           SELECT a.doc_id AS id1, b.doc_id AS id2,
             CAST(len(list_intersect(a.shs, b.shs)) AS BIGINT) AS inter,
             CAST(len(a.shs) + len(b.shs)
               - len(list_intersect(a.shs, b.shs)) AS BIGINT) AS uni
           FROM sh100 a JOIN sh100 b ON a.doc_id < b.doc_id),
         jt AS (
           SELECT id1, id2, inter, uni,
             CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) AS j
           FROM allp),
         tt AS (SELECT *, 1.0 - ((j * j) * (j * j)) AS t FROM jt),
         th AS (
           SELECT id1, id2, inter, uni,
             CAST(floor((1.0 - (((t * t) * (t * t)) * ((t * t) * (t * t))))
               * 1000000.0) AS BIGINT) AS theory_e6
           FROM tt),
         joined AS (
           SELECT th.inter, th.uni, th.theory_e6,
             CASE WHEN c.id1 IS NOT NULL THEN 1 ELSE 0 END AS is_cand,
             (th.inter * 1000000 // th.uni) // 100000 AS bkt
           FROM th LEFT JOIN cpairs c
             ON th.id1 = c.id1 AND th.id2 = c.id2)
         SELECT bkt, count(*) AS n_pairs,
           CAST(sum(is_cand) AS BIGINT) AS n_cand,
           CAST(sum(is_cand) AS BIGINT) * 1000000 // count(*) AS cand_rate_e6,
           CAST(sum(theory_e6) AS BIGINT) // count(*) AS mean_theory_e6
         FROM joined GROUP BY bkt""",


    "q477_isotropy" -> {
      val h60q = graft.queries.TrainingShared.h60(
        "concat('iso:', CAST(vec_id AS VARCHAR))")
      def ldot(a: String, b: String) =
        s"CAST(list_sum(list_transform(range(1, 65), " +
          s"i -> $a[CAST(i AS INT)] * $b[CAST(i AS INT)])) AS BIGINT)"
      s"""WITH e AS (
           SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 64) AS BIGINT)) AS ve,
             $h60q AS hv
           FROM embeddings),
         rk AS (
           SELECT ve, row_number() OVER (ORDER BY hv, vec_id) AS r
           FROM e),
         pr AS (
           SELECT a.j, a.v1, b.v2
           FROM (SELECT (r - 1) // 2 AS j, ve AS v1 FROM rk
                 WHERE (r - 1) % 2 = 0) a
           JOIN (SELECT (r - 1) // 2 AS j, ve AS v2 FROM rk
                 WHERE (r - 1) % 2 = 1) b USING (j)),
         cosa AS (
           SELECT CAST(floor(CAST(${ldot("v1", "v2")} AS DOUBLE)
             / (sqrt(CAST(${ldot("v1", "v1")} AS DOUBLE))
               * sqrt(CAST(${ldot("v2", "v2")} AS DOUBLE)))
             * 1000000.0) AS BIGINT) AS cos_e6
           FROM pr),
         cs AS (
           SELECT count(*) AS n_pairs,
             CAST(sum(cos_e6) AS BIGINT) // count(*) AS mean_cos_e6
           FROM cosa),
         dims AS (
           SELECT CAST(i - 1 AS BIGINT) AS dim,
             CAST(sum(CAST(floor(CAST(embedding[CAST(i AS INT)] AS DOUBLE)
               * 64) AS BIGINT)) AS BIGINT) AS sv,
             count(*) AS n,
             CAST(sum(CAST(floor(CAST(embedding[CAST(i AS INT)] AS DOUBLE)
               * 64) AS BIGINT)
               * CAST(floor(CAST(embedding[CAST(i AS INT)] AS DOUBLE)
               * 64) AS BIGINT)) AS BIGINT) AS ssv
           FROM embeddings, (SELECT unnest(range(1, 65)) AS i)
           GROUP BY 1),
         iso0 AS (
           SELECT max(n) AS n, CAST(sum(ssv) AS BIGINT) AS ss_all,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list((CAST(sv AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(sv AS DOUBLE) / CAST(n AS DOUBLE))
                 ORDER BY dim)), (acc, x) -> acc + x) AS mu2
           FROM dims),
         iso AS (
           SELECT CAST(floor(mu2
             / (CAST(ss_all AS DOUBLE) / CAST(n AS DOUBLE))
             * 1000000.0) AS BIGINT) AS mean_energy_ratio_e6
           FROM iso0)
         SELECT n_pairs, mean_cos_e6, mean_energy_ratio_e6
         FROM cs, iso"""
    },

    "q471_speculative_acceptance" ->
      """WITH e AS (
           SELECT
             greatest(1, least(999999, CAST(floor(
               (CAST(embedding[1] AS DOUBLE) + 1.0) / 2.0 * 1000000.0)
               AS BIGINT))) AS pd_e6,
             greatest(1, least(999999, CAST(floor(
               (CAST(embedding[2] AS DOUBLE) + 1.0) / 2.0 * 1000000.0)
               AS BIGINT))) AS pt_e6
           FROM embeddings),
         a AS (
           SELECT least(1000000, pt_e6 * 1000000 // pd_e6) AS acc_e6
           FROM e),
         ag AS (
           SELECT count(*) AS n, CAST(sum(acc_e6) AS BIGINT) AS sa
           FROM a),
         ch AS (
           SELECT *, (CAST(sa AS DOUBLE) / CAST(n AS DOUBLE)) / 1000000.0
             AS alpha
           FROM ag)
         SELECT n, sa // n AS alpha_e6,
           CAST(floor((1.0 - (((alpha * alpha) * (alpha * alpha)) * alpha))
             / (1.0 - alpha) * 1000000.0) AS BIGINT)
             AS tokens_per_step_e6
         FROM ch""",

    "q465_dedup_threshold_sweep" ->
      s"""WITH $minhashCtes,
         cpairs AS MATERIALIZED (
           SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         sh100 AS (
           SELECT doc_id,
             list_distinct(list_transform(range(1, len(w) - 1),
               i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))) AS shs
           FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
                 FROM documents WHERE doc_id < 300)
           WHERE len(w) >= 3),
         jac AS MATERIALIZED (
           SELECT c.id1, c.id2,
             CAST(len(list_intersect(a.shs, b.shs)) AS BIGINT) * 100
               // CAST(len(a.shs) + len(b.shs)
                 - len(list_intersect(a.shs, b.shs)) AS BIGINT) AS j_e2
           FROM cpairs c
           JOIN sh100 a ON a.doc_id = c.id1
           JOIN sh100 b ON b.doc_id = c.id2),
         th AS (
           SELECT CAST(t0 * 10 AS BIGINT) AS t_e2
           FROM (SELECT unnest(range(5, 10)) AS t0)),
         g AS (
           SELECT t_e2, id2, count(*) AS np
           FROM th JOIN jac ON j_e2 >= t_e2 GROUP BY 1, 2),
         ch AS (
           SELECT doc_id AS id2, n_chars AS ch
           FROM documents WHERE doc_id < 300)
         SELECT t_e2, CAST(sum(np) AS BIGINT) AS n_pairs,
           count(*) AS n_docs_removed,
           CAST(sum(ch) AS BIGINT) AS chars_removed
         FROM g JOIN ch USING (id2) GROUP BY 1""",

    "q464_multiprobe_lsh" ->
      s"""WITH ${simhashPairCtes()},
         truth AS MATERIALIZED (
           SELECT a.doc_id AS id1, b.doc_id AS id2
           FROM sims a JOIN sims b ON a.doc_id < b.doc_id
           WHERE bit_count(xor(a.sim, b.sim)) <= 6),
         keyed AS (SELECT doc_id, sim % 32768 AS key FROM sims),
         base AS MATERIALIZED (
           SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           FROM keyed a JOIN keyed b
             ON a.key = b.key AND a.doc_id < b.doc_id),
         probes AS (
           SELECT doc_id, unnest(list_distinct(list_prepend(key,
             list_transform(range(0, 15), b -> xor(key, 1 << b))))) AS key
           FROM keyed),
         mp AS MATERIALIZED (
           SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           FROM probes a JOIN keyed b
             ON a.key = b.key AND a.doc_id < b.doc_id),
         cnts AS (
           SELECT (SELECT count(*) FROM truth) AS n_truth,
             (SELECT count(*) FROM base) AS n_base,
             (SELECT count(*) FROM mp) AS n_multiprobe,
             (SELECT count(*) FROM truth JOIN base USING (id1, id2))
               AS hit_base,
             (SELECT count(*) FROM truth JOIN mp USING (id1, id2))
               AS hit_mp)
         SELECT n_truth, n_base, n_multiprobe, hit_base, hit_mp,
           hit_base * 1000000 // greatest(n_truth, 1) AS recall_base_e6,
           hit_mp * 1000000 // greatest(n_truth, 1) AS recall_mp_e6
         FROM cnts""",

    "q459_mmd_linear" -> {
      def dt(a: String, b: String) = iDotSql(a, b)
      s"""WITH e AS (
           SELECT vec_id, label % 2 = 1 AS grp, embedding FROM embeddings),
         ra AS (
           SELECT vec_id, embedding,
             CAST(row_number() OVER (ORDER BY vec_id) AS BIGINT) AS r
           FROM e WHERE grp),
         rb AS (
           SELECT vec_id, embedding,
             CAST(row_number() OVER (ORDER BY vec_id) AS BIGINT) AS r
           FROM e WHERE NOT grp),
         xp AS (
           SELECT a.j, a.x1, b.x2
           FROM (SELECT (r - 1) // 2 AS j, embedding AS x1 FROM ra
                 WHERE (r - 1) % 2 = 0) a
           JOIN (SELECT (r - 1) // 2 AS j, embedding AS x2 FROM ra
                 WHERE (r - 1) % 2 = 1) b USING (j)),
         yp AS (
           SELECT a.j, a.y1, b.y2
           FROM (SELECT (r - 1) // 2 AS j, embedding AS y1 FROM rb
                 WHERE (r - 1) % 2 = 0) a
           JOIN (SELECT (r - 1) // 2 AS j, embedding AS y2 FROM rb
                 WHERE (r - 1) % 2 = 1) b USING (j)),
         h AS (
           SELECT (${dt("x1", "x2")}) + (${dt("y1", "y2")})
             - (${dt("x1", "y2")}) - (${dt("x2", "y1")}) AS h
           FROM xp JOIN yp USING (j))
         SELECT count(*) AS n_pairs, CAST(sum(h) AS BIGINT) AS sum_h,
           CAST(sum(h) AS BIGINT) // greatest(count(*), 1) AS mmd2_mean
         FROM h"""
    },

    "q460_davies_bouldin" ->
      """WITH pts AS (
           SELECT vec_id, CAST(label AS BIGINT) AS lab,
             CAST(i - 1 AS BIGINT) AS dim,
             CAST(floor(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 64)
               AS BIGINT) AS v
           FROM embeddings, (SELECT unnest(range(1, 65)) AS i)),
         cen AS (
           SELECT lab, dim, CAST(sum(v) AS BIGINT) // count(*) AS cd
           FROM pts GROUP BY 1, 2),
         d2 AS (
           SELECT p.lab, p.vec_id,
             CAST(sum((p.v - c.cd) * (p.v - c.cd)) AS BIGINT) AS d2
           FROM pts p JOIN cen c USING (lab, dim) GROUP BY 1, 2),
         se AS (
           SELECT lab,
             CAST(floor(sqrt(CAST(d2 AS DOUBLE)) * 1000.0) AS BIGINT)
               AS s_e3
           FROM d2),
         si AS (
           SELECT lab, count(*) AS n_pts,
             CAST(sum(s_e3) AS BIGINT) // count(*) AS s_e3
           FROM se GROUP BY 1),
         m0 AS (
           SELECT a.lab, b.lab2,
             CAST(sum((a.cd - b.cd2) * (a.cd - b.cd2)) AS BIGINT) AS m2
           FROM cen a JOIN (SELECT lab AS lab2, dim, cd AS cd2 FROM cen) b
             USING (dim)
           WHERE a.lab <> b.lab2 GROUP BY 1, 2),
         m AS (
           SELECT lab, lab2,
             CAST(floor(sqrt(CAST(m2 AS DOUBLE)) * 1000.0) AS BIGINT)
               AS m_e3
           FROM m0),
         r AS (
           SELECT si.lab, si.n_pts, si.s_e3, m.lab2,
             (si.s_e3 + sj.s2_e3) * 1000000 // greatest(m.m_e3, 1)
               AS ratio_e6
           FROM si JOIN m USING (lab)
           JOIN (SELECT lab AS lab2, s_e3 AS s2_e3 FROM si) sj
             USING (lab2)),
         best AS (
           SELECT lab, n_pts, s_e3, ratio_e6, lab2,
             row_number() OVER (PARTITION BY lab
               ORDER BY ratio_e6 DESC, lab2 DESC) AS rn
           FROM r QUALIFY rn = 1)
         SELECT lab, n_pts, s_e3, ratio_e6 AS worst_ratio_e6,
           lab2 AS worst_other
         FROM best""",

    "q436_weighted_jaccard" ->
      s"""WITH $minhashCtes,
         mpairs AS MATERIALIZED (
           SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         tc AS (
           SELECT doc_id, tok, count(*) AS c
           FROM (SELECT doc_id, unnest(w) AS tok FROM toks)
           GROUP BY 1, 2),
         nd AS (SELECT count(*) AS n FROM documents WHERE doc_id < 300),
         idf AS (
           SELECT tok, CAST((SELECT n FROM nd) // count(*) AS BIGINT) AS wt
           FROM tc GROUP BY tok),
         pa AS (
           SELECT p.id1, p.id2, t.tok, t.c AS c1
           FROM mpairs p JOIN tc t ON t.doc_id = p.id1),
         pb AS (
           SELECT p.id1, p.id2, t.tok, t.c AS c2
           FROM mpairs p JOIN tc t ON t.doc_id = p.id2),
         u AS (
           SELECT coalesce(pa.id1, pb.id1) AS id1,
             coalesce(pa.id2, pb.id2) AS id2,
             coalesce(pa.tok, pb.tok) AS tok,
             coalesce(c1, 0) AS c1, coalesce(c2, 0) AS c2
           FROM pa FULL JOIN pb
             ON pa.id1 = pb.id1 AND pa.id2 = pb.id2 AND pa.tok = pb.tok),
         j AS (
           SELECT id1, id2,
             CAST(sum(least(c1, c2) * wt) AS BIGINT) AS num,
             CAST(sum(greatest(c1, c2) * wt) AS BIGINT) AS den,
             CAST(sum(least(c1, c2)) AS BIGINT) AS ni,
             CAST(sum(greatest(c1, c2)) AS BIGINT) AS nu
           FROM u JOIN idf USING (tok) GROUP BY 1, 2)
         SELECT id1, id2, num * 1000000 // den AS wj_e6,
           ni * 1000000 // nu AS j_e6
         FROM j""",

    "q434_facility_location" -> {
      val rounds = (1 to 5).map { r =>
        val excl = if (r == 1) "" else
          " AND c NOT IN (" +
            (1 until r).map(i => s"SELECT cid FROM b$i").mkString(" UNION ALL ") +
            ")"
        s"""g$r AS MATERIALIZED (
           SELECT c, CAST(sum(sv - cov) AS BIGINT) AS gain
           FROM sims JOIN cov${r - 1} USING (v)
           WHERE sv > cov$excl GROUP BY c),
         b$r AS MATERIALIZED (
           SELECT c AS cid, gain FROM g$r ORDER BY gain DESC, c LIMIT 1),
         cov$r AS MATERIALIZED (
           SELECT p.v, greatest(p.cov, s.sv) AS cov
           FROM cov${r - 1} p JOIN sims s
             ON s.v = p.v AND s.c = (SELECT cid FROM b$r)),
         t$r AS (
           SELECT CAST($r AS BIGINT) AS round, cid AS c, gain,
             (SELECT CAST(sum(cov) AS BIGINT) FROM cov$r) AS cov_total
           FROM b$r)"""
      }.mkString(",\n         ")
      val unions = (1 to 5).map(r => s"SELECT * FROM t$r")
        .mkString("\n         UNION ALL ")
      s"""WITH pool AS (
           SELECT vec_id AS c, embedding AS ce
           FROM embeddings WHERE vec_id < 64),
         sims AS MATERIALIZED (
           SELECT e.vec_id AS v, p.c,
             greatest(0, ${iDotSql("e.embedding", "p.ce")}) AS sv
           FROM embeddings e CROSS JOIN pool p),
         cov0 AS (
           SELECT vec_id AS v, CAST(0 AS BIGINT) AS cov FROM embeddings),
         $rounds
         $unions"""
    },

    "q428_capture_recapture" ->
      s"""WITH $minhashCtes,
         mpairs AS MATERIALIZED (
           SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         ${simhashPairCtes()},
         c1 AS (SELECT count(*) AS n1 FROM mpairs),
         c2 AS (SELECT count(*) AS n2 FROM spairs),
         cm AS (
           SELECT count(*) AS m
           FROM mpairs JOIN spairs USING (id1, id2))
         SELECT n1, n2, m,
           n1 + n2 - m AS n_union,
           (n1 + 1) * (n2 + 1) // (m + 1) - 1 AS n_hat,
           (n1 + 1) * (n2 + 1) * (n1 - m) * (n2 - m)
             // ((m + 1) * (m + 1) * (m + 2)) AS var_hat,
           CASE WHEN (n1 + 1) * (n2 + 1) // (m + 1) - 1 > 0
             THEN (n1 + n2 - m) * 1000000
               // ((n1 + 1) * (n2 + 1) // (m + 1) - 1)
             ELSE 1000000 END AS coverage_e6
         FROM c1, c2, cm""",

    "q365_dedup_method_agreement" ->
      s"""WITH $minhashCtes,
         mpairs AS MATERIALIZED (
           SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         ${simhashPairCtes()},
         php AS (
           SELECT doc_id, pv, CAST(list_sum(pv) AS BIGINT) // 60 AS pm
           FROM (SELECT doc_id,
                   list_transform(range(0, 60),
                     i -> CAST(ascii(substr(text,
                            CAST(1 + (i * length(text)) // 60 AS INT), 1))
                          AS BIGINT)) AS pv
                 FROM documents
                 WHERE doc_id < 300 AND length(text) >= 60)),
         phh AS (
           SELECT doc_id,
             CAST(list_sum(list_transform(range(0, 60),
               i -> CASE WHEN pv[CAST(i + 1 AS INT)] > pm
                    THEN (CAST(1 AS BIGINT) << CAST(i AS INT))
                    ELSE 0 END)) AS BIGINT) AS ph
           FROM php),
         pbanded AS (
           SELECT doc_id, ph, band,
             (ph >> CAST(band * 15 AS INT)) & 32767 AS key
           FROM phh, (SELECT unnest(range(0, 4)) AS band)),
         pcapped AS (
           SELECT doc_id, ph, band, key,
             row_number() OVER (PARTITION BY band, key ORDER BY doc_id) AS rn
           FROM pbanded QUALIFY rn <= 64),
         ppairs AS (
           SELECT id1, id2 FROM (
             SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
               a.ph AS h1, b.ph AS h2
             FROM pcapped a JOIN pcapped b
               ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
           WHERE bit_count(xor(h1, h2)) <= 6),
         tagged AS (
           SELECT id1, id2, 'minhash' AS m FROM mpairs
           UNION ALL SELECT id1, id2, 'simhash' FROM spairs
           UNION ALL SELECT id1, id2, 'phash' FROM ppairs),
         sizes AS (SELECT m, count(*) AS n FROM tagged GROUP BY m),
         inter AS (
           SELECT a.m AS m1, b.m AS m2, count(*) AS n_inter
           FROM tagged a JOIN tagged b
             ON a.id1 = b.id1 AND a.id2 = b.id2 AND a.m < b.m
           GROUP BY 1, 2)
         SELECT s1.m AS m1, s2.m AS m2, s1.n AS n1, s2.n AS n2,
           CAST(coalesce(i.n_inter, 0) AS BIGINT) AS n_inter,
           CAST(coalesce(i.n_inter, 0) AS BIGINT) * 1000000
             // (s1.n + s2.n - coalesce(i.n_inter, 0)) AS jaccard_e6
         FROM sizes s1 JOIN sizes s2 ON s1.m < s2.m
         LEFT JOIN inter i ON i.m1 = s1.m AND i.m2 = s2.m""",


    "q364_prefix_cache" ->
      """WITH b AS (
           SELECT substr(text, 1, 32) AS prefix, count(*) AS n
           FROM documents WHERE length(text) >= 32
           GROUP BY 1 HAVING count(*) > 1),
         s AS (
           SELECT prefix, n, 32 * (n - 1) AS saved_chars FROM b),
         tot AS (SELECT CAST(sum(saved_chars) AS BIGINT) AS tot_saved FROM s)
         SELECT prefix, n, CAST(saved_chars AS BIGINT) AS saved_chars,
           CAST(saved_chars AS BIGINT) * 1000000 // tot_saved AS share_e6
         FROM s CROSS JOIN tot""",


    "q363_margin_calibration" ->
      s"""WITH ${marginPairsCtes(200L, 4)},
         lab AS (
           SELECT vec_id, CAST(label AS BIGINT) AS lab FROM embeddings),
         j AS (
           SELECT sp.margin_e6 // 100000 AS bkt,
             CASE WHEN la.lab = lb.lab THEN 1 ELSE 0 END AS same
           FROM scored_pairs sp
           JOIN lab la ON sp.id_a = la.vec_id
           JOIN lab lb ON sp.id_b = lb.vec_id)
         SELECT bkt, count(*) AS n_pairs,
           CAST(sum(same) AS BIGINT) AS n_same,
           CAST(sum(same) AS BIGINT) * 1000000 // count(*) AS same_rate_e6
         FROM j GROUP BY bkt""",


    "q362_manifest_diff" ->
      s"""WITH leaves AS (
           SELECT source, doc_id % 10 <> 0 AS in_a,
             ${h60("concat(doc_id, ':', md5(text))")} AS leaf
           FROM documents)
         SELECT source,
           CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           count(*) AS n_b,
           CAST(bit_xor(CASE WHEN in_a THEN leaf ELSE 0 END) AS BIGINT)
             AS digest_a,
           CAST(bit_xor(leaf) AS BIGINT) AS digest_b,
           bit_xor(CASE WHEN in_a THEN leaf ELSE 0 END) <> bit_xor(leaf)
             AS changed
         FROM leaves GROUP BY source""",


    "q361_simhash_neardup" ->
      s"""WITH sims AS (
           SELECT doc_id,
             CAST(list_sum(list_transform(range(0, 60), j ->
               (CASE WHEN list_sum(list_transform(hs,
                      h -> ((h >> j) % 2) * 2 - 1)) > 0
                     THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)
               << j)) AS BIGINT) AS sim
           FROM (
             SELECT doc_id,
               list_transform(string_split(lower(text), ' '),
                 t -> ${h60("t")}) AS hs
             FROM documents WHERE doc_id < 300)),
         banded AS (
           SELECT doc_id, sim, band,
             (sim >> CAST(band * 15 AS INT)) & 32767 AS key
           FROM sims, (SELECT unnest(range(0, 4)) AS band)),
         capped AS (
           SELECT doc_id, sim, band, key,
             row_number() OVER (PARTITION BY band, key ORDER BY doc_id) AS rn
           FROM banded QUALIFY rn <= 64),
         pairs AS (
           SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
             a.sim AS h1, b.sim AS h2
           FROM capped a JOIN capped b
             ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
         SELECT id1, id2, CAST(bit_count(xor(h1, h2)) AS BIGINT) AS hamming
         FROM pairs WHERE bit_count(xor(h1, h2)) <= 6""",


    "q360_mauve_cells" ->
      s"""WITH cent AS (
           SELECT label, list(c_e6 ORDER BY dim) AS cvec
           FROM (SELECT label, dim,
                   CAST(floor(avg(CAST(v AS DOUBLE)) * 1000000.0) AS BIGINT) AS c_e6
                 FROM (SELECT label, unnest(embedding) AS v,
                         generate_subscripts(embedding, 1) AS dim
                       FROM embeddings)
                 GROUP BY 1, 2)
           GROUP BY label),
         assign AS (
           SELECT vec_id, cell FROM (
             SELECT e.vec_id, c.label AS cell,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY (${dotSql("e.embedding", "c.cvec")})
                   / (sqrt(${dotSql("e.embedding", "e.embedding")})
                      * sqrt(${dotSql("c.cvec", "c.cvec")})) DESC,
                 c.label ASC) AS rn
             FROM embeddings e, cent c) WHERE rn = 1),
         counts AS (
           SELECT cell,
             CAST(sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS cp,
             CAST(sum(CASE WHEN vec_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS cq
           FROM assign GROUP BY cell),
         tot AS (
           SELECT CAST(sum(cp) AS BIGINT) AS np,
             CAST(sum(cq) AS BIGINT) AS nq
           FROM counts),
         terms AS (
           SELECT
             CASE WHEN cp > 0 THEN CAST(floor(
                 (CAST(cp AS DOUBLE) / CAST(np AS DOUBLE))
                 * ln((CAST(cp AS DOUBLE) / CAST(np AS DOUBLE))
                      / (((CAST(cp AS DOUBLE) / CAST(np AS DOUBLE))
                          + (CAST(cq AS DOUBLE) / CAST(nq AS DOUBLE)))
                         / 2.0))
                 * 1000000000.0) AS BIGINT) ELSE 0 END AS tp,
             CASE WHEN cq > 0 THEN CAST(floor(
                 (CAST(cq AS DOUBLE) / CAST(nq AS DOUBLE))
                 * ln((CAST(cq AS DOUBLE) / CAST(nq AS DOUBLE))
                      / (((CAST(cp AS DOUBLE) / CAST(np AS DOUBLE))
                          + (CAST(cq AS DOUBLE) / CAST(nq AS DOUBLE)))
                         / 2.0))
                 * 1000000000.0) AS BIGINT) ELSE 0 END AS tq
           FROM counts CROSS JOIN tot)
         SELECT count(*) AS n_cells,
           CAST(sum(tp) AS BIGINT) AS klp_e9,
           CAST(sum(tq) AS BIGINT) AS klq_e9,
           CAST(sum(tp) + sum(tq) AS BIGINT) AS jsd2_e9
         FROM terms""",


    "q359_merkle_manifest" ->
      s"""WITH leaves AS (
           SELECT source,
             ${h60("concat(doc_id, ':', md5(text))")} AS leaf
           FROM documents),
         per_source AS (
           SELECT source, count(*) AS n_docs,
             CAST(bit_xor(leaf) AS BIGINT) AS digest
           FROM leaves GROUP BY source)
         SELECT source AS part, n_docs, digest FROM per_source
         UNION ALL
         SELECT '(ALL)' AS part, CAST(sum(n_docs) AS BIGINT) AS n_docs,
           ${h60("string_agg(source || ':' || digest, '|' ORDER BY source)")}
             AS digest
         FROM per_source""",


    "q454_dawid_skene" -> {
      def likSql(v: String, sen: String, spe: String, yes: Boolean) =
        if (yes)
          s"""(CASE WHEN $v IS NULL THEN 1000000
                 WHEN $v = 1 THEN $sen ELSE 1000000 - $sen END)"""
        else
          s"""(CASE WHEN $v IS NULL THEN 1000000
                 WHEN $v = 0 THEN $spe ELSE 1000000 - $spe END)"""
      def conf(j: Int) =
        s"""CAST(sum(CASE WHEN v$j = 1 THEN p ELSE 0 END) AS BIGINT) AS a$j,
             CAST(sum(CASE WHEN v$j IS NOT NULL THEN p ELSE 0 END)
               AS BIGINT) AS b$j,
             CAST(sum(CASE WHEN v$j = 0 THEN 1000000 - p ELSE 0 END)
               AS BIGINT) AS c$j,
             CAST(sum(CASE WHEN v$j IS NOT NULL THEN 1000000 - p ELSE 0 END)
               AS BIGINT) AS e$j"""
      val rounds = (1 to 2).map { r =>
        val prev = if (r == 1) "p0" else s"e${r - 1}"
        s"""ms$r AS MATERIALIZED (
           SELECT count(*) AS n, CAST(sum(p) AS BIGINT) AS sp,
             ${conf(1)},
             ${conf(2)},
             ${conf(3)}
           FROM $prev),
         m$r AS MATERIALIZED (
           SELECT sp // n AS pi,
             a1 * 1000000 // greatest(b1, 1) AS sen1,
             c1 * 1000000 // greatest(e1, 1) AS spe1,
             a2 * 1000000 // greatest(b2, 1) AS sen2,
             c2 * 1000000 // greatest(e2, 1) AS spe2,
             a3 * 1000000 // greatest(b3, 1) AS sen3,
             c3 * 1000000 // greatest(e3, 1) AS spe3
           FROM ms$r),
         e$r AS MATERIALIZED (
           SELECT doc_id, v1, v2, v3, nv,
             CASE WHEN la + lb > 0 THEN la * 1000000 // (la + lb)
               ELSE 500000 END AS p
           FROM (
             SELECT doc_id, v1, v2, v3, nv,
               ((pi * ${likSql("v1", "sen1", "spe1", yes = true)} // 1000000)
                 * ${likSql("v2", "sen2", "spe2", yes = true)} // 1000000)
                 * ${likSql("v3", "sen3", "spe3", yes = true)} // 1000000
                 AS la,
               (((1000000 - pi)
                 * ${likSql("v1", "sen1", "spe1", yes = false)} // 1000000)
                 * ${likSql("v2", "sen2", "spe2", yes = false)} // 1000000)
                 * ${likSql("v3", "sen3", "spe3", yes = false)} // 1000000
                 AS lb
             FROM $prev, m$r))"""
      }.mkString(",\n         ")
      s"""WITH base AS (
           SELECT doc_id, lower(text) AS tl,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_ws,
             CAST(length(text) AS BIGINT) AS n_ch
           FROM documents),
         lf AS (
           SELECT doc_id,
             CASE WHEN tl LIKE '%spark%' OR tl LIKE '%fast%' THEN 1
                  WHEN tl LIKE '%slow%' THEN 0 END AS v1,
             CASE WHEN n_ws > 150 THEN 1 WHEN n_ws < 30 THEN 0 END AS v2,
             CASE WHEN (n_ch * 10) // n_ws BETWEEN 40 AND 80 THEN 1
                  ELSE 0 END AS v3
           FROM base),
         votes AS (
           SELECT doc_id, v1, v2, v3,
             CAST(CASE WHEN v1 IS NOT NULL THEN 1 ELSE 0 END
               + CASE WHEN v2 IS NOT NULL THEN 1 ELSE 0 END
               + CASE WHEN v3 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS nv
           FROM lf),
         p0 AS (
           SELECT doc_id, v1, v2, v3, nv,
             CASE WHEN nv > 0
               THEN (COALESCE(v1, 0) + COALESCE(v2, 0) + COALESCE(v3, 0))
                 * 1000000 // nv
               ELSE 500000 END AS p
           FROM votes),
         $rounds,
         fin AS (
           SELECT count(*) AS n_items, CAST(sum(p) AS BIGINT) AS sp,
             CAST(sum(CASE WHEN (p >= 500000) <>
               ((COALESCE(v1, 0) + COALESCE(v2, 0) + COALESCE(v3, 0)) * 2
                 >= greatest(nv, 1)) THEN 1 ELSE 0 END) AS BIGINT)
               AS n_flipped
           FROM e2),
         m2f AS (
           SELECT
             CAST(sum(CASE WHEN v1 = 1 THEN p ELSE 0 END) AS BIGINT)
               * 1000000 // greatest(CAST(sum(CASE WHEN v1 IS NOT NULL
                 THEN p ELSE 0 END) AS BIGINT), 1) AS sen1_e6,
             CAST(sum(CASE WHEN v2 = 1 THEN p ELSE 0 END) AS BIGINT)
               * 1000000 // greatest(CAST(sum(CASE WHEN v2 IS NOT NULL
                 THEN p ELSE 0 END) AS BIGINT), 1) AS sen2_e6,
             CAST(sum(CASE WHEN v3 = 1 THEN p ELSE 0 END) AS BIGINT)
               * 1000000 // greatest(CAST(sum(CASE WHEN v3 IS NOT NULL
                 THEN p ELSE 0 END) AS BIGINT), 1) AS sen3_e6
           FROM e2)
         SELECT n_items, sp // n_items AS pi_e6, n_flipped,
           sen1_e6, sen2_e6, sen3_e6
         FROM fin, m2f"""
    },

    "q358_weak_supervision" ->
      """WITH base AS (
           SELECT doc_id, lower(text) AS tl,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_ws,
             CAST(length(text) AS BIGINT) AS n_ch
           FROM documents),
         lf AS (
           SELECT doc_id,
             CASE WHEN tl LIKE '%spark%' OR tl LIKE '%fast%' THEN 1
                  WHEN tl LIKE '%slow%' THEN 0 END AS lf1,
             CASE WHEN n_ws > 150 THEN 1 WHEN n_ws < 30 THEN 0 END AS lf2,
             CASE WHEN (n_ch * 10) // n_ws BETWEEN 40 AND 80 THEN 1
                  ELSE 0 END AS lf3
           FROM base),
         m AS (
           SELECT *,
             (CASE WHEN lf1 = 1 THEN 1 ELSE 0 END
              + CASE WHEN lf2 = 1 THEN 1 ELSE 0 END
              + CASE WHEN lf3 = 1 THEN 1 ELSE 0 END) AS v1,
             (CASE WHEN lf1 = 0 THEN 1 ELSE 0 END
              + CASE WHEN lf2 = 0 THEN 1 ELSE 0 END
              + CASE WHEN lf3 = 0 THEN 1 ELSE 0 END) AS v0
           FROM lf),
         mm AS (
           SELECT *, CASE WHEN v1 > v0 THEN 1 WHEN v0 > v1 THEN 0 END AS maj
           FROM m),
         u AS (
           SELECT 'lf_keyword' AS lf, lf1 AS v, maj FROM mm
           UNION ALL SELECT 'lf_length', lf2, maj FROM mm
           UNION ALL SELECT 'lf_meanlen', lf3, maj FROM mm)
         SELECT lf, count(*) AS n_docs,
           count(v) AS n_votes,
           count(v) * 1000000 // count(*) AS coverage_e6,
           CAST(sum(CASE WHEN v = maj THEN 1 ELSE 0 END) AS BIGINT)
             AS n_agree,
           CAST(sum(CASE WHEN v IS NOT NULL AND maj IS NOT NULL
                         AND v <> maj THEN 1 ELSE 0 END) AS BIGINT)
             AS n_conflict,
           CASE WHEN count(CASE WHEN v IS NOT NULL AND maj IS NOT NULL
                           THEN 1 END) > 0
             THEN CAST(sum(CASE WHEN v = maj THEN 1 ELSE 0 END) AS BIGINT)
                  * 1000000
                  // count(CASE WHEN v IS NOT NULL AND maj IS NOT NULL
                          THEN 1 END)
             ELSE 0 END AS agree_e6
         FROM u GROUP BY lf""",


    "q383_jl_distortion" -> jlDistortionOracle,


    "q398_fs_em" -> fsEmOracle,


    "q384_churn_labels" ->
      """WITH ev AS (
           SELECT user_id,
             CAST(floor(date_part('epoch', ts)) AS BIGINT) AS ts_s,
             event_type
           FROM events),
         anchor AS (SELECT max(ts_s) AS t0 FROM ev),
         g AS (
           SELECT user_id,
             CAST(sum(CASE WHEN ts_s >= t0 - 4838400 AND ts_s < t0 - 2419200
               THEN 1 ELSE 0 END) AS BIGINT) AS n_feat_events,
             CAST(sum(CASE WHEN ts_s >= t0 - 4838400 AND ts_s < t0 - 2419200
               AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_feat_purchases,
             CAST(sum(CASE WHEN ts_s >= t0 - 2419200 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_label_events
           FROM ev CROSS JOIN anchor GROUP BY user_id)
         SELECT user_id, n_feat_events, n_feat_purchases,
           n_label_events = 0 AS churned
         FROM g WHERE n_feat_events > 0""",


    "q382_binary_rerank_recall" ->
      s"""WITH codes AS (
           SELECT vec_id, embedding,
             CAST(list_sum(list_transform(range(0, 60),
               i -> CASE WHEN CAST(embedding[CAST(i + 1 AS INT)] AS DOUBLE)
                         > 0.0
                    THEN (CAST(1 AS BIGINT) << CAST(i AS INT))
                    ELSE 0 END)) AS BIGINT) AS code
           FROM embeddings),
         q AS (
           SELECT vec_id AS query_id, code AS qcode, embedding AS qemb
           FROM codes WHERE vec_id IN (10, 20, 30)),
         cand AS (
           SELECT query_id, vec_id, embedding, qemb FROM (
             SELECT q.query_id, c.vec_id, c.embedding, q.qemb,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY bit_count(xor(c.code, q.qcode)), c.vec_id) AS hrnk
             FROM codes c, q WHERE c.vec_id <> q.query_id)
           WHERE hrnk <= 50),
         rr AS (
           SELECT query_id, vec_id AS neighbor_id FROM (
             SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY (${dotSql("embedding", "qemb")})
                   / (sqrt(${dotSql("embedding", "embedding")})
                      * sqrt(${dotSql("qemb", "qemb")})) DESC,
                 vec_id ASC) AS rnk
             FROM cand)
           WHERE rnk <= 10),
         qe AS (
           SELECT vec_id AS query_id, embedding AS qemb
           FROM embeddings WHERE vec_id IN (10, 20, 30)),
         bf AS (
           SELECT query_id, vec_id AS neighbor_id FROM (
             SELECT qe.query_id, e.vec_id,
               row_number() OVER (PARTITION BY qe.query_id
                 ORDER BY (${dotSql("e.embedding", "qe.qemb")})
                   / (sqrt(${dotSql("e.embedding", "e.embedding")})
                      * sqrt(${dotSql("qe.qemb", "qe.qemb")})) DESC,
                 e.vec_id ASC) AS rnk
             FROM embeddings e, qe WHERE e.vec_id <> qe.query_id)
           WHERE rnk <= 10)
         SELECT bf.query_id, count(*) AS k,
           CAST(sum(CASE WHEN h.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_hit,
           CAST(sum(CASE WHEN h.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) * 1000000 // count(*) AS recall_e6
         FROM bf LEFT JOIN rr h
           ON bf.query_id = h.query_id AND bf.neighbor_id = h.neighbor_id
         GROUP BY bf.query_id""",


    "q381_binary_recall" ->
      s"""WITH codes AS (
           SELECT vec_id,
             CAST(list_sum(list_transform(range(0, 60),
               i -> CASE WHEN CAST(embedding[CAST(i + 1 AS INT)] AS DOUBLE)
                         > 0.0
                    THEN (CAST(1 AS BIGINT) << CAST(i AS INT))
                    ELSE 0 END)) AS BIGINT) AS code
           FROM embeddings),
         q AS (
           SELECT vec_id AS query_id, code AS qcode
           FROM codes WHERE vec_id IN (10, 20, 30)),
         ham AS (
           SELECT query_id, vec_id AS neighbor_id FROM (
             SELECT q.query_id, c.vec_id,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY bit_count(xor(c.code, q.qcode)), c.vec_id) AS rnk
             FROM codes c, q WHERE c.vec_id <> q.query_id)
           WHERE rnk <= 10),
         qe AS (
           SELECT vec_id AS query_id, embedding AS qemb
           FROM embeddings WHERE vec_id IN (10, 20, 30)),
         bf AS (
           SELECT query_id, vec_id AS neighbor_id FROM (
             SELECT qe.query_id, e.vec_id,
               row_number() OVER (PARTITION BY qe.query_id
                 ORDER BY (${dotSql("e.embedding", "qe.qemb")})
                   / (sqrt(${dotSql("e.embedding", "e.embedding")})
                      * sqrt(${dotSql("qe.qemb", "qe.qemb")})) DESC,
                 e.vec_id ASC) AS rnk
             FROM embeddings e, qe WHERE e.vec_id <> qe.query_id)
           WHERE rnk <= 10)
         SELECT bf.query_id, count(*) AS k,
           CAST(sum(CASE WHEN h.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_hit,
           CAST(sum(CASE WHEN h.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) * 1000000 // count(*) AS recall_e6
         FROM bf LEFT JOIN ham h
           ON bf.query_id = h.query_id AND bf.neighbor_id = h.neighbor_id
         GROUP BY bf.query_id""",


    "q380_scrub_residual" ->
      """WITH s AS (
           SELECT text,
             regexp_replace(regexp_replace(text, '[0-9]+', '<NUM>', 'g'),
               '[a-zA-Z0-9.]+@[a-zA-Z0-9.]+', '<EMAIL>', 'g') AS scrubbed
           FROM documents)
         SELECT count(*) AS n_docs,
           CAST(sum(CASE WHEN scrubbed <> text THEN 1 ELSE 0 END) AS BIGINT)
             AS n_changed,
           CAST(sum(CASE WHEN regexp_matches(scrubbed, '[0-9]')
             THEN 1 ELSE 0 END) AS BIGINT) AS n_residual_digits,
           CAST(sum(CASE WHEN regexp_matches(scrubbed,
             '[a-zA-Z0-9.]+@[a-zA-Z0-9.]+') THEN 1 ELSE 0 END) AS BIGINT)
             AS n_residual_emails
         FROM s""",


    "q378_fusion_provenance" ->
      s"""SELECT query_id, count(*) AS n,
           CAST(sum(CASE WHEN r_dense IS NOT NULL AND r_sparse IS NULL
             THEN 1 ELSE 0 END) AS BIGINT) AS dense_only,
           CAST(sum(CASE WHEN r_dense IS NULL AND r_sparse IS NOT NULL
             THEN 1 ELSE 0 END) AS BIGINT) AS sparse_only,
           CAST(sum(CASE WHEN r_dense IS NOT NULL AND r_sparse IS NOT NULL
             THEN 1 ELSE 0 END) AS BIGINT) AS both_lists
         FROM ($rrfFusionOracle) GROUP BY query_id""",


    "q324_trustrank" ->
      s"""WITH $minhashCtes,
         pairs AS MATERIALIZED (
           SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         edges AS (
           SELECT id1 AS src, id2 AS dst FROM pairs
           UNION ALL
           SELECT id2 AS src, id1 AS dst FROM pairs),
         deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
         nodes AS (SELECT src AS node, deg, src < 20 AS is_seed FROM deg),
         ns AS (SELECT CAST(sum(CASE WHEN is_seed THEN 1 ELSE 0 END)
                  AS BIGINT) AS ns FROM nodes),
         sb AS MATERIALIZED (
           SELECT node, deg, is_seed,
             CASE WHEN is_seed THEN 1000000 // ns ELSE CAST(0 AS BIGINT) END
               AS s_e6
           FROM nodes, ns),
         v0 AS (SELECT node, s_e6 AS v_e6 FROM sb),
         i1 AS (SELECT e.dst, CAST(sum(v.v_e6 // d.deg) AS BIGINT) AS inflow
                FROM edges e JOIN v0 v ON e.src = v.node
                JOIN deg d ON e.src = d.src GROUP BY 1),
         v1 AS (SELECT sb.node,
                  (15 * sb.s_e6) // 100
                    + (85 * coalesce(i1.inflow, 0)) // 100 AS v_e6
                FROM sb LEFT JOIN i1 ON sb.node = i1.dst),
         i2 AS (SELECT e.dst, CAST(sum(v.v_e6 // d.deg) AS BIGINT) AS inflow
                FROM edges e JOIN v1 v ON e.src = v.node
                JOIN deg d ON e.src = d.src GROUP BY 1),
         v2 AS (SELECT sb.node,
                  (15 * sb.s_e6) // 100
                    + (85 * coalesce(i2.inflow, 0)) // 100 AS v_e6
                FROM sb LEFT JOIN i2 ON sb.node = i2.dst),
         i3 AS (SELECT e.dst, CAST(sum(v.v_e6 // d.deg) AS BIGINT) AS inflow
                FROM edges e JOIN v2 v ON e.src = v.node
                JOIN deg d ON e.src = d.src GROUP BY 1),
         v3 AS (SELECT sb.node,
                  (15 * sb.s_e6) // 100
                    + (85 * coalesce(i3.inflow, 0)) // 100 AS v_e6
                FROM sb LEFT JOIN i3 ON sb.node = i3.dst)
         SELECT sb.node AS doc_id, sb.deg, sb.is_seed, v3.v_e6 AS trust_e6
         FROM sb JOIN v3 ON sb.node = v3.node""",


    "q326_umass_coherence" ->
      """WITH dt AS MATERIALIZED (
           SELECT DISTINCT source, doc_id, term FROM (
             SELECT source, doc_id,
               unnest(string_split(lower(text), ' ')) AS term
             FROM documents)),
         dfr AS (SELECT source, term, count(*) AS df FROM dt GROUP BY 1, 2),
         top AS MATERIALIZED (
           SELECT source, term, df, rk FROM (
             SELECT *, row_number() OVER (PARTITION BY source
               ORDER BY df DESC, term ASC) AS rk
             FROM dfr) WHERE rk <= 5),
         dtop AS (
           SELECT dt.source, dt.doc_id, dt.term
           FROM dt JOIN top ON dt.source = top.source AND dt.term = top.term),
         co AS (
           SELECT a.source, a.term AS t1, b.term AS t2, count(*) AS d12
           FROM dtop a JOIN dtop b
             ON a.source = b.source AND a.doc_id = b.doc_id
               AND a.term < b.term
           GROUP BY 1, 2, 3),
         prs AS (
           SELECT l.source, least(l.term, m.term) AS t1,
             greatest(l.term, m.term) AS t2, l.df AS dfl
           FROM top l JOIN top m
             ON l.source = m.source AND l.rk < m.rk),
         scored AS (
           SELECT prs.source,
             CAST(floor(ln(CAST(coalesce(d12, 0) + 1 AS DOUBLE)
               / CAST(dfl AS DOUBLE)) * 1000000000.0) AS BIGINT) AS term_e9
           FROM prs LEFT JOIN co ON prs.source = co.source
             AND prs.t1 = co.t1 AND prs.t2 = co.t2)
         SELECT source, count(*) AS n_pairs,
           CAST(sum(term_e9) AS BIGINT) AS coherence_e9
         FROM scored GROUP BY 1""",


    "q328_burrows_delta" ->
      """WITH st AS MATERIALIZED (
           SELECT source, term, count(*) AS c FROM (
             SELECT source, unnest(string_split(lower(text), ' ')) AS term
             FROM documents)
           GROUP BY 1, 2),
         src_tot AS (
           SELECT source, CAST(sum(c) AS BIGINT) AS tot
           FROM st GROUP BY 1),
         top AS (
           SELECT term FROM (
             SELECT term, CAST(sum(c) AS BIGINT) AS gc,
               row_number() OVER (ORDER BY sum(c) DESC, term ASC) AS rk
             FROM st GROUP BY term) WHERE rk <= 20),
         f AS (
           SELECT st.source, st.term, (st.c * 1000000) // tot AS f_e6
           FROM st JOIN top ON st.term = top.term
           JOIN src_tot ON st.source = src_tot.source),
         grid AS MATERIALIZED (
           SELECT s.source, t.term, coalesce(f.f_e6, 0) AS f_e6
           FROM (SELECT source FROM src_tot) s
           CROSS JOIN top t
           LEFT JOIN f ON f.source = s.source AND f.term = t.term),
         sigma AS (
           SELECT term,
             CAST(count(*) * sum(f_e6 * f_e6) - sum(f_e6) * sum(f_e6)
               AS DOUBLE)
               / CAST(count(*) * count(*) AS DOUBLE) AS v
           FROM grid GROUP BY 1),
         prs AS (
           SELECT a.source AS src_a, b.source AS src_b, a.term,
             CAST(floor(CAST(abs(a.f_e6 - b.f_e6) AS DOUBLE) / sqrt(v)
               * 1000000.0) AS BIGINT) AS t_e6
           FROM grid a
           JOIN grid b ON a.term = b.term AND a.source < b.source
           JOIN sigma ON sigma.term = a.term
           WHERE v > 0.0)
         SELECT src_a, src_b, count(*) AS n_terms,
           CAST(sum(t_e6) AS BIGINT) AS delta_sum_e6
         FROM prs GROUP BY 1, 2""",


    "q331_negative_sampling" ->
      """WITH tok AS MATERIALIZED (
           SELECT doc_id,
             generate_subscripts(string_split(lower(text), ' '), 1) - 1
               AS pos,
             unnest(string_split(lower(text), ' ')) AS term
           FROM documents),
         vocab AS (
           SELECT term, count(*) AS c,
             CAST(floor(sqrt(CAST(count(*) AS DOUBLE)
               * sqrt(CAST(count(*) AS DOUBLE))) * 1000) AS BIGINT) AS w
           FROM tok GROUP BY 1),
         ranges AS (
           SELECT term, w,
             CAST(sum(w) OVER (ORDER BY term ROWS UNBOUNDED PRECEDING)
               AS BIGINT) AS hi
           FROM vocab),
         r2 AS (SELECT term, w, hi, hi - w AS lo FROM ranges),
         tot AS (SELECT max(hi) AS wtot FROM r2),
         draws AS (
           SELECT t.doc_id, t.pos, j.j,
             CAST(concat('0x', substr(md5(
               concat_ws(':', t.doc_id, t.pos, j.j)), 1, 15)) AS BIGINT)
               % wtot AS h
           FROM tok t
           CROSS JOIN (SELECT unnest([1, 2]) AS j) j
           CROSS JOIN tot
           WHERE t.pos < 5)
         SELECT r2.term AS neg, r2.w, count(*) AS n_draws
         FROM draws JOIN r2 ON h >= lo AND h < hi
         GROUP BY 1, 2""",


    "q333_good_turing" ->
      """WITH tc AS (
           SELECT term, count(*) AS c FROM (
             SELECT unnest(string_split(lower(text), ' ')) AS term
             FROM documents)
           GROUP BY 1),
         coc AS (SELECT c, count(*) AS n_c FROM tc GROUP BY 1),
         nxt AS (SELECT c - 1 AS c, n_c AS n_c1 FROM coc)
         SELECT coc.c, coc.n_c, coalesce(nxt.n_c1, 0) AS n_c1,
           ((coc.c + 1) * coalesce(nxt.n_c1, 0) * 1000000) // coc.n_c
             AS c_star_e6
         FROM coc LEFT JOIN nxt ON coc.c = nxt.c
         WHERE coc.c <= 5""",


    "q334_brier_bins" ->
      """WITH base AS (
           SELECT greatest(0, least(1000,
               CAST(floor((CAST(embedding[1] AS DOUBLE) + 1.0) / 2.0
                 * 1000) AS BIGINT))) AS p_e3,
             label % 2 = 1 AS pos
           FROM embeddings),
         b2 AS (
           SELECT p_e3, pos,
             CASE WHEN pos THEN 1000 ELSE 0 END AS o_e3,
             least(p_e3 // 100, 9) AS bucket
           FROM base)
         SELECT bucket, count(*) AS n,
           CAST(sum(p_e3) AS BIGINT) AS sp_e3,
           CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
           CAST(sum(p_e3) AS BIGINT) // count(*) AS fbar_e3,
           (CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) * 1000)
             // count(*) AS obar_e3,
           CAST(sum(p_e3) AS BIGINT) // count(*)
             - (CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT)
                * 1000) // count(*) AS gap_e3,
           CAST(sum((p_e3 - o_e3) * (p_e3 - o_e3)) AS BIGINT)
             AS brier_sum_e6
         FROM b2 GROUP BY 1""",


    "q337_roc_points" ->
      """WITH per AS (
           SELECT CAST(floor((CAST(embedding[1] AS DOUBLE) + 1.0)
               / 2.0 * 10) AS BIGINT) AS bkt,
             CAST(sum(CASE WHEN label % 2 = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS np,
             CAST(sum(CASE WHEN label % 2 = 1 THEN 0 ELSE 1 END)
               AS BIGINT) AS nn
           FROM embeddings GROUP BY 1),
         tot AS (
           SELECT CAST(sum(np) AS BIGINT) AS p_tot,
             CAST(sum(nn) AS BIGINT) AS n_tot
           FROM per),
         cum AS (
           SELECT bkt,
             CAST(sum(np) OVER (ORDER BY bkt DESC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tp,
             CAST(sum(nn) OVER (ORDER BY bkt DESC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS fp
           FROM per)
         SELECT bkt AS threshold_bkt, tp, fp,
           (tp * 1000000) // p_tot AS tpr_e6,
           (fp * 1000000) // n_tot AS fpr_e6
         FROM cum, tot"""
  )
}
