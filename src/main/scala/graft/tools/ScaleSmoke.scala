package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{GraftSession, Tables}
import graft.functions.{Bpe, FastText, TextFunctions}
import graft.operators.{AudioHash, Dedup, Html, ImageHash, Mp4Meta, Multimodal, Sampling, Similarity, TextOps, Urls, VideoHash, Warc}

/** Empirical scale check for the flagship pipeline operators: amplify the
  * sf0.1 corpus N× in-memory (id-remapped copies — same text/embedding
  * distributions, so LSH bucket shapes are realistic) and verify the
  * operators' cost actually grows like their design notes claim:
  *
  *  - `minhashCandidates` / `exactGroups`: linear in docs (slim-band
  *    shuffle, bucket caps engaged);
  *  - `axisKnnGraph`: near-linear because nBits derives from the corpus
  *    count (at FIXED nBits it would be quadratic — the r05 verdict's
  *    exact concern);
  *  - `connectedComponents`: rounds bounded by component diameter, work by
  *    edge count.
  *
  * `runMain graft.tools.ScaleSmoke [factor] [sfDir]` — prints per-operator
  * wall times at 1× and factor×, with the observed scaling exponent
  * log(tN/t1)/log(N) (≈1 linear, ≈2 quadratic; local[32] JIT noise makes
  * anything ≤1.3 comfortably linear).
  */
object ScaleSmoke {

  private def amplifyDocs(df: DataFrame, factor: Int): DataFrame =
    df.crossJoin(spark_range(factor).select(col("id").as("__copy")))
      .select((col("doc_id") * factor + col("__copy")).as("doc_id"),
        // Perturb copies so they are not exact dups of each other (exact
        // dedup would otherwise collapse the amplification): stable suffix.
        concat(col("text"), lit(" copy"), col("__copy")).as("text"))

  /** Amplification that PRESERVES the near-dup cluster-size distribution:
    * every word gets a copy-specific suffix, so copy i's shingle sets are
    * disjoint from copy j's (cross-copy jaccard exactly 0) while token
    * count, doc length structure and INTRA-copy jaccard are identical to
    * the raw corpus — each copy reproduces the original planted clusters
    * instead of merging all copies of one doc into a factor×-bigger
    * cluster. This is the production 20×-crawl shape (corpus grows,
    * cluster sizes don't). The plain [[amplifyDocs]] is the adversarial
    * shape for cluster-driven operators: pair/edge workload grows
    * ~C(factor,2)/factor super-linearly BY CONSTRUCTION, so exponents
    * measured under it track that workload, not the plan (bestOfCluster:
    * 1.62 at 20× under amplifyDocs — consistent with the ~9.5×
    * super-linear pair growth, not with plan defects). A between-words
    * marker-insertion variant was rejected: with markers at every other
    * position a 5-token shingle carries only 3 real words, so the corpus's
    * effective shingle length halves, jaccard similarity inflates, and
    * clusters balloon (57× slowdown at 1× from the larger pair/edge
    * workload — a changed WORKLOAD, not a changed plan).
    */
  private def amplifyDocsClusterStable(df: DataFrame, factor: Int): DataFrame =
    df.crossJoin(spark_range(factor).select(col("id").as("__copy")))
      .select((col("doc_id") * factor + col("__copy")).as("doc_id"),
        regexp_replace(col("text"), lit("(\\S+)"),
          concat(lit("$1c"), col("__copy"))).as("text"))

  private def amplifyEmb(df: DataFrame, factor: Int): DataFrame =
    df.crossJoin(spark_range(factor).select(col("id").as("__copy")))
      .select((col("vec_id") * factor + col("__copy")).as("vec_id"),
        // Flip the last coordinate's sign per copy parity so copies spread
        // over buckets instead of stacking in one.
        transform(col("embedding"), (x, i) =>
          when(i === 63 && col("__copy") % 2 === 1, -x).otherwise(x))
          .as("embedding"))

  private def spark_range(n: Int) =
    org.apache.spark.sql.SparkSession.active.range(n)

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(20)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = GraftSession.builder(s"local[$cpus]", "graft-scale-smoke")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs1 = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).cache()
    val emb1 = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).cache()
    val docsN = amplifyDocs(docs1, factor).cache()
    val embN = amplifyEmb(emb1, factor).cache()
    val (d1, dN) = (docs1.count(), docsN.count())
    val (e1, eN) = (emb1.count(), embN.count())
    println(s"[scale] docs $d1 -> $dN, embeddings $e1 -> $eN (${factor}x)")

    def report(name: String, t1: Double, tN: Double): Unit = {
      val exp = math.log(tN / t1) / math.log(factor.toDouble)
      println(f"[scale] $name%-22s 1x=$t1%6.2fs ${factor}x=$tN%7.2fs  exponent=$exp%5.2f")
    }

    // Warm JIT on the small corpus first; measure second runs.
    def bench2(f: DataFrame => Long, small: DataFrame, big: DataFrame,
               name: String): Unit = {
      f(small)
      val t1 = time(f(small))
      val tN = time(f(big))
      report(name, t1, tN)
    }

    bench2(df => Dedup.exactGroups(df, "doc_id", "text").count(),
      docs1, docsN, "exactGroups")
    bench2(df => Dedup.minhashCandidates(df, "doc_id", "text").count(),
      docs1, docsN, "minhashCandidates")
    bench2({ df =>
      val n = df.count()
      val nBits = Similarity.deriveNBits(n, 32)
      Similarity.axisKnnGraph(df, k = 5, nBits = nBits, probeHamming = 1).count()
    }, emb1, embN, "axisKnnGraph(derived)")
    bench2({ df =>
      val n = df.count()
      val nBits = Similarity.deriveNBits(n, 32)
      val pairs = Similarity.axisNearPairs(df, minCos = 0.5, nBits = nBits)
      Dedup.connectedComponents(df.select(col("vec_id").as("id")), pairs).count()
    }, emb1, embN, "semanticClusters")
    // Round-7 addition: canonical selection over the full dup-cluster DAG
    // — after the single-pass max_by rewrite the label join (and the
    // minhash band shuffle under it) is evaluated exactly once. Measured
    // on the cluster-stable amplification: under plain amplifyDocs the
    // WORKLOAD (pairs/edges per cluster) grows ~C(f,2)/f super-linearly by
    // construction and the exponent reports that, not the plan.
    // The 1x side is also marker-inserted (factor=1): copies carry 2x the
    // tokens of the raw text, so a raw-text baseline would overstate the
    // exponent by log_f(2) from per-doc work alone.
    val docs1Stable = amplifyDocsClusterStable(docs1, 1).cache()
    val docsNStable = amplifyDocsClusterStable(docs1, factor).cache()
    docs1Stable.count(); docsNStable.count()
    bench2(df => Dedup.bestOfCluster(df, "doc_id", "text",
        score = length(col("text")).cast("double")).count(),
      docs1Stable, docsNStable, "bestOfCluster")
    // Round-6 additions: bigram-LM scoring (word-count-shaped aggs + one
    // bigram join) and span cutting (amplified copies share almost every
    // window, so this measures the cut path's worst case: nearly all
    // windows duplicated and expanded w-fold into covered positions).
    bench2(df => TextOps.ngramPerplexity(df, "doc_id", "text").count(),
      docs1, docsN, "ngramPerplexity")
    // Aggregate over the COMPUTED columns: a bare count() lets Catalyst
    // eliminate the outer joins that carry the whole cut (right sides are
    // groupBy-distinct on the key), timing an empty plan.
    bench2(df => Dedup.cutDuplicateSpans(df, "doc_id", "text")
        .agg(sum(col("n_tokens_cut")), sum(length(col("clean_text"))))
        .collect().length.toLong,
      docs1, docsN, "cutDuplicateSpans")
    // Global training-order shuffle (two-phase prefix sum — its claim is
    // precisely "no single-partition bottleneck", so the exponent is the
    // evidence) and CDC chunking (window + reassembly on one shuffle).
    // Both aggregate over the computed column so nothing is eliminated.
    bench2(df => Sampling.deterministicShuffle(df, "doc_id")
        .agg(max(col("shuffle_pos"))).collect().length.toLong,
      docs1, docsN, "deterministicShuffle")
    bench2(df => TextOps.cdcChunks(df, "doc_id", "text", avgChunkTokens = 16)
        .agg(sum(length(col("chunk")))).collect().length.toLong,
      docs1, docsN, "cdcChunks")
    // Round-8 addition: the real-codec image path (PNG encode -> ImageIO
    // decode, per-row pure compute, no shuffle) — linear by construction;
    // the exponent pins that the mapPartitions plumbing adds no
    // cross-partition coupling.
    bench2(df => Multimodal.decodeImageFeatures(Multimodal.plantPngs(df))
        .agg(sum(col("pixel_sum"))).collect().length.toLong,
      docs1, docsN, "imageDecode")
    // Round-13 additions. All five are designed as narrow per-row work
    // (regex/codec transforms, no shuffle except p72's slim id+canon
    // window), so exponents ≈1 pin that nothing couples across rows:
    // HTML strip + block extraction (regex over planted pages),
    // URL canonicalization incl. the canonical-dup count window,
    // MP4 box walk, and the 16-bit per-channel audio decimation chain.
    // Each aggregates over computed columns so nothing is eliminated.
    bench2(df => Html.pageFeatures(
        Html.plantHtml(df, "doc_id", "text"), "id", "html")
        .agg(sum(col("text_chars")), sum(col("ld_micro")))
        .collect().length.toLong,
      docs1, docsN, "htmlExtract")
    bench2(df => Html.blockExtract(
        Html.plantHtml(df, "doc_id", "text"), "id", "html")
        .agg(sum(col("main_chars")), sum(col("n_kept")))
        .collect().length.toLong,
      docs1, docsN, "blockExtract")
    bench2(df => Urls.withCanonical(
        Urls.plantUrls(df, "doc_id"), "id", "url")
        .agg(sum(length(col("canon_url"))), max(col("n_dups")))
        .collect().length.toLong,
      docs1, docsN, "urlCanonicalize")
    bench2(df => Mp4Meta.parseMp4Meta(Mp4Meta.plantMp4s(df))
        .agg(sum(col("duration_ms")), sum(col("n_tracks")))
        .collect().length.toLong,
      docs1, docsN, "mp4MetaWalk")
    bench2(df => Multimodal.decodeAudioFeatures(
        Multimodal.resampleAudioDecimated(Multimodal.plantWavs16(df), 2))
        .agg(sum(col("amp_sum"))).collect().length.toLong,
      docs1, docsN, "audio16Resample")
    // Round-14 additions. dhashSignatures / warcParse / bpeEncode are
    // narrow per-row codec/scan work (exponent ≈1 pins no cross-row
    // coupling). dhashNearDupPairs' WORKLOAD grows super-linearly by
    // construction under amplification (amplified ids mint new planted
    // images, so hash-collision cliques grow and candidate pairs grow
    // ~f² — the bestOfCluster effect): its exponent tracks the pair
    // count, not a plan defect; the signatures row is the plan signal.
    // sum of POPCOUNTS, not raw hashes: summing 64-bit hashes overflows
    // Long under ANSI mode at a few thousand rows.
    bench2(df => ImageHash.dhashSignatures(Multimodal.plantPngs(df))
        .agg(sum(bit_count(col("dhash")))).collect().length.toLong,
      docs1, docsN, "dhashSignatures")
    // Measured CAPPED (maxBucketSize=1000, the 100 TB configuration —
    // minhash's default): uncapped, the 16-bit band value space saturates
    // under amplification (100k structured images → thousand-member
    // buckets → quadratic bucket-local pairs; 285 s / exponent 1.65 at
    // 20×, workload-by-construction). bandBucketStats is the cap monitor.
    bench2(df => ImageHash.nearDupPairs(
        ImageHash.dhashSignatures(Multimodal.plantPngs(df)),
        maxBucketSize = 1000L)
        .agg(sum(col("hamming")), count(lit(1))).collect().length.toLong,
      docs1, docsN, "dhashNearDupPairs(cap)")
    bench2(df => Warc.parseWarc(Warc.plantWarcs(df))
        .agg(sum(col("content_length"))).collect().length.toLong,
      docs1, docsN, "warcParse")
    bench2({ df =>
      Bpe.register(df.sparkSession)
      df.select(Bpe.bpeEncode(TextFunctions.normText(col("text"))).as("ids"))
        .agg(sum(size(col("ids")))).collect().length.toLong
    }, docs1, docsN, "bpeEncode")
    // Round-15 additions: audio fingerprinting mirrors the dHash pair —
    // narrow per-row decode (exponent ≈1), pairs measured CAPPED (the
    // 100 TB configuration; uncapped band-space saturation is quadratic
    // by construction, the same pigeonhole as dhash). popcount sum, not
    // raw hash sum (ANSI Long overflow).
    bench2({ df =>
      Bpe.registerBig(df.sparkSession)
      df.select(Bpe.bpeEncodeBig(TextFunctions.normText(col("text")))
          .as("ids"))
        .agg(sum(size(col("ids")))).collect().length.toLong
    }, docs1, docsN, "bpeEncodeBig")
    bench2(df => AudioHash.fingerprints(Multimodal.plantWavs16(df))
        .agg(sum(bit_count(col("fhash")))).collect().length.toLong,
      docs1, docsN, "audioFingerprints")
    bench2(df => AudioHash.nearDupPairs(
        AudioHash.fingerprints(Multimodal.plantWavs16(df)),
        maxBucketSize = 1000L)
        .agg(sum(col("hamming")), count(lit(1))).collect().length.toLong,
      docs1, docsN, "audioNearDupPairs(cap)")
    // Round-16 additions: video fingerprints are the heaviest narrow
    // codec pass (demux + per-frame decode + fold — exponent ≈1 pins no
    // cross-row coupling); pairs measured CAPPED as usual; the
    // classifier is a pure WSCG scan; admission's bridge CC is
    // O(batch + touched clusters) — its exponent tracks batch size.
    bench2(df => VideoHash.fingerprints(Multimodal.plantGifsFp(df),
        everyN = 2)
        .agg(sum(bit_count(col("vhash")))).collect().length.toLong,
      docs1, docsN, "videoFingerprints")
    bench2(df => VideoHash.nearDupPairs(
        VideoHash.fingerprints(Multimodal.plantGifsFp(df), everyN = 2),
        maxBucketSize = 1000L)
        .agg(sum(col("hamming")), count(lit(1))).collect().length.toLong,
      docs1, docsN, "videoNearDupPairs(cap)")
    bench2({ df =>
      FastText.register(df.sparkSession)
      df.select(FastText.score(TextFunctions.normText(col("text")))
          .as("score"))
        .agg(sum(col("score"))).collect().length.toLong
    }, docs1, docsN, "fasttextScore")
    bench2({ df =>
      val sigs = ImageHash.dhashSignatures(Multimodal.plantPngsFp(df))
      val labels = Dedup.connectedComponents(
        sigs.select(col("media_id").as("id")),
        ImageHash.nearDupPairs(sigs, maxBucketSize = 1000L))
      val batch = ImageHash.dhashSignatures(Multimodal.plantPngsFp(
        df.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + (1L << 41)).as("doc_id"))))
      Dedup.admitToClusters(labels,
          batch.select(col("media_id").as("id")),
          ImageHash.incrementalNearDupPairs(sigs, batch,
              maxBucketSize = 1000L)
            .select(col("corpus_id"), col("batch_id")),
          ImageHash.nearDupPairs(batch, maxBucketSize = 1000L)
            .select(col("id_a"), col("id_b")))
        .agg(sum(col("cluster_id")), count(lit(1)))
        .collect().length.toLong
    }, docs1, docsN, "admitToClusters(cap)")
    // Round-16 part 2: containment joins scale with window/frame rows ×
    // bucket fan-out (capped by default — the exponent pins the slim-row
    // equi-join, not a payload cross); PQ encode is a pure WSCG scan over
    // the broadcast codebook; ADC top-k scans 8-byte codes against a
    // FIXED broadcast query set (linear in corpus).
    bench2(df => AudioHash.containmentPairs(
        AudioHash.windowFingerprints(Multimodal.plantWavsSeg(df), 130, 26))
        .agg(sum(col("offset_wins")), count(lit(1)))
        .collect().length.toLong,
      docs1, docsN, "audioContainment")
    bench2(df => VideoHash.containmentPairs(
        VideoHash.frameHashes(Multimodal.plantGifsSeg(df)))
        .agg(sum(col("offset_frames")), count(lit(1)))
        .collect().length.toLong,
      docs1, docsN, "videoContainment")
    bench2({ df =>
      val pq = graft.functions.Pq.encode(col("embedding"))
      df.select(col("vec_id"), pq.getField("code").as("c"))
        .agg(sum(bit_count(col("c")))).collect().length.toLong
    }, emb1, embN, "pqEncode")
    bench2({ df =>
      import org.apache.spark.sql.expressions.Window
      val P = graft.functions.Pq
      val codes = df.select(col("vec_id"),
        P.encode(col("embedding")).getField("code").as("pq_code"))
      // fixed 10-query set regardless of corpus size (the production
      // shape: query volume doesn't grow with the corpus)
      val qs = broadcast(emb1.filter(col("vec_id") % 50 === 0).limit(10)
        .select(col("vec_id").as("qid"), P.lut(col("embedding")).as("lut")))
      val adc = (0 until P.M).map { m =>
        element_at(col("lut"),
          (lit(m * P.K + 1) + shiftright(col("pq_code"), 4 * m)
            .bitwiseAND(lit(15L))).cast("int"))
      }.reduce(_ + _)
      codes.join(qs)
        .withColumn("adc", adc)
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("adc"), col("vec_id"))))
        .filter(col("rn") <= 5)
        .agg(sum(col("rn"))).collect().length.toLong
    }, emb1, embN, "pqAdcTopK")
    // Round-17 trainers: each iteration is one narrow scan + an
    // aggregation bounded by the MODEL size (map-side combine), so the
    // exponent pins the scan, not the model exchange. bpeTrain runs on
    // the cluster-stable amplification (its vocab grows with the corpus
    // there — the Heaps-law shape — whereas plain amplify adds only
    // factor suffix words); the containment survivors/refresh joins are
    // the capped slim-row equi-join shape.
    bench2(df => graft.functions.KMeans
        .train(df, "vec_id", "embedding", k = 16, dim = 64, iters = 2)
        .centroids.length.toLong,
      emb1, embN, "kmeansTrain(2it)")
    bench2(df => graft.functions.Pq
        .train(df, "vec_id", "embedding", iters = 2)
        .codebook.length.toLong,
      emb1, embN, "pqTrain(2it)")
    // Round-18: the sampled trainer under the production discipline —
    // fraction sized so the TRAINING SLICE stays ~constant as the corpus
    // grows (the FAISS train-on-sample shape). Per-iteration cost should
    // decouple from corpus size; the residual exponent is the one
    // up-front count + sample scan.
    bench2({ df =>
      val n = math.max(1L, df.count())
      val frac = math.min(1.0, 4000.0 / n)
      graft.functions.KMeans
        .train(df, "vec_id", "embedding", k = 16, dim = 64, iters = 2,
          sampleFraction = frac)
        .centroids.length.toLong
    }, emb1, embN, "kmeansTrainSampled(~4k slice)")
    bench2(df => graft.operators.BpeTrain
        .train(graft.operators.BpeTrain.wordVocab(df, col("text")), 4)
        .merges.length.toLong,
      docs1Stable, docsNStable, "bpeTrain(4merges)")
    bench2(df => FastText
        .train(df, TextFunctions.normText(col("text")),
          length(col("text")) % 2 === 0)
        .length.toLong,
      docs1, docsN, "classifierTrain")
    bench2({ df =>
      val wf = AudioHash.windowFingerprints(Multimodal.plantWavsSeg(df),
          130, 26)
        .filter(col("decoded") && col("win_idx").isNotNull)
      graft.operators.SequenceContainment.survivors(
          wf.select(col("media_id").as("id")).distinct(),
          AudioHash.containmentPairs(wf))
        .agg(sum(when(col("is_survivor"), 1L).otherwise(0L)))
        .collect().length.toLong
    }, docs1, docsN, "containmentSurvivors")
    bench2({ df =>
      val base = AudioHash.windowFingerprints(Multimodal.plantWavsSeg(df),
        130, 26)
      val batch = base
        .filter(col("decoded") && col("media_id") % 7 === 2)
        .withColumn("media_id", col("media_id") + (1L << 43))
      AudioHash.incrementalContainmentPairs(base, batch)
        .agg(sum(col("offset_wins")), count(lit(1)))
        .collect().length.toLong
    }, docs1, docsN, "incrContainment")
    // Round-17 part 2: cluster-scoped semantic dedup measured under the
    // PRODUCTION k-scaling discipline (hash cells sized ~32, k grows
    // with the corpus — the SemDeDup contract that keeps per-cell
    // quadratic work constant; at FIXED k the within-cell pair count
    // grows ~f² by construction). The recall eval's exact side is a
    // FIXED 10-query panel (query volume doesn't grow with the corpus);
    // residual encode is a narrow broadcast-join + WSCG scan against
    // FIXED trained models (models are fit once, applied to any scale).
    bench2({ df =>
      val n = df.count()
      val k = math.max(1L, n / 32L)
      val assigned = df.withColumn("cell",
        pmod(col("vec_id") * lit(2654435761L), lit(k)).cast("bigint"))
      Similarity.semanticDedup(assigned, tau = 0.5)
        .agg(sum(when(col("kept"), 1L).otherwise(0L)))
        .collect().length.toLong
    }, emb1, embN, "semanticDedup(k~N/32)")
    bench2({ df =>
      import org.apache.spark.sql.expressions.Window
      val qs = broadcast(emb1.filter(col("vec_id") % 50 === 0).limit(10)
        .select(col("vec_id").as("qid"), col("embedding").as("qe")))
      df.join(qs)
        .select(col("qid"), col("vec_id"),
          graft.functions.VectorFunctions
            .l2Squared(col("embedding"), col("qe")).as("d2"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("d2"), col("vec_id"))))
        .filter(col("rn") <= 5)
        .agg(sum(col("rn"))).collect().length.toLong
    }, emb1, embN, "exactTopK(fixed panel)")
    val kmFixed = graft.functions.KMeans
      .train(emb1, "vec_id", "embedding", k = 16, dim = 64, iters = 1)
    val pqFixed = graft.functions.Pq
      .train(emb1, "vec_id", "embedding", iters = 1)
    bench2({ df =>
      import spark.implicits._
      val cents = (0 until kmFixed.k).map(c => (c,
        (0 until 64).map(j => kmFixed.centroids(c * 64 + j))))
        .toDF("cell", "cv")
      val dl = graft.functions.KMeans.dists(col("embedding"), kmFixed, spark)
      df.select(col("vec_id"), col("embedding"),
          (array_position(dl, array_min(dl)) - 1).cast("int").as("cell"))
        .join(broadcast(cents), Seq("cell"))
        .select(graft.functions.Pq.encodeWith(
          zip_with(col("embedding"), col("cv"),
            (x, c) => (x.cast("double") - c).cast("float")),
          pqFixed.bc, spark).getField("code").as("c"))
        .agg(sum(bit_count(col("c")))).collect().length.toLong
    }, emb1, embN, "residualEncode(fixed)")
    // Round-18 part 2: pair extraction is a narrow regex pass + a slim
    // canonical-URL equi-join (media records synthesized closed-form so
    // the exponent pins the PAIR operator, not the PNG codec measured
    // above); the interleaved doc is the blockExtract-class alternation
    // pass; hard negatives rank a FIXED 8-probe panel against the
    // corpus signatures (linear in corpus, the p119 eval-class shape)
    // on top of the capped CC labels.
    bench2({ df =>
      val pages = df.select(col("doc_id"),
        Html.plantedPageWithFigures(col("doc_id"), col("text")).as("html"))
      val media = df.filter(col("doc_id") % 4 === 0)
        .select(col("doc_id").as("image_id"),
          Urls.plantedImageUrl(col("doc_id")).as("img_url"),
          lit(true).as("decoded"))
      Html.imageTextPairs(pages, "doc_id", "html",
          media, "image_id", "img_url", "decoded")
        .agg(sum(col("n_caption_words")),
          sum(when(col("kept"), 1L).otherwise(0L)))
        .collect().length.toLong
    }, docs1, docsN, "imageTextPairs")
    bench2({ df =>
      val pages = df.select(col("doc_id"),
        Html.plantedPageWithAllFigures(col("doc_id"), col("text"))
          .as("html"))
      Html.interleavedDoc(pages, "doc_id", "html", allModalities = true)
        .agg(sum(col("n_words")), count(lit(1)))
        .collect().length.toLong
    }, docs1, docsN, "interleavedDoc(all)")
    bench2({ df =>
      import org.apache.spark.sql.expressions.Window
      val sigs = ImageHash.dhashSignatures(Multimodal.plantPngsFp(df))
        .filter(col("decoded"))
      val labels = Dedup.connectedComponents(
        sigs.select(col("media_id").as("id")),
        ImageHash.nearDupPairs(sigs, maxBucketSize = 1000L))
      val lab = sigs.select(col("media_id"), col("dhash"))
        .join(labels.select(col("id").as("media_id"), col("cluster_id")),
          Seq("media_id"))
      val probes = broadcast(lab.orderBy(col("media_id")).limit(8)
        .select(col("media_id").as("probe_id"), col("dhash").as("qh"),
          col("cluster_id").as("qc")))
      lab.join(probes, col("media_id") =!= col("probe_id") &&
          col("cluster_id") =!= col("qc"))
        .withColumn("dist",
          bit_count(col("qh").bitwiseXOR(col("dhash"))).cast("int"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("probe_id"))
            .orderBy(col("dist"), col("media_id"))))
        .filter(col("rn") <= 3)
        .agg(sum(col("dist"))).collect().length.toLong
    }, docs1, docsN, "hardNegatives(fixed panel)")
    spark.stop()
  }
}
