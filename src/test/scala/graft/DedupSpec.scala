package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox leaps over the lazy dog"), // near dup
    (4L, "completely different words entirely unrelated content here now")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts under min id") {
    val g = Dedup.exactDupGroups(docs, "doc_id", "text")
      .filter(col("dup_count") > 1).collect()
    assert(g.length == 1)
    assert(g.head.getAs[Long]("canonical_id") == 1L)
    assert(g.head.getAs[Long]("dup_count") == 2L)
    val h = Dedup.exactDupGroupsHashed(docs, "doc_id", "text")
      .filter(col("dup_count") > 1).collect()
    assert(h.length == 1 && h.head.getAs[Long]("canonical_id") == 1L)
  }

  test("hash-keyed exact dedup returns the same rows as the text-keyed plan") {
    val byText = Dedup.exactDupGroups(docs, "doc_id", "text")
      .orderBy("canonical_id").collect().toSeq
    val byHash = Dedup.exactDupGroupsByHash(docs, "doc_id", "text")
      .orderBy("canonical_id").collect().toSeq
    assert(byText == byHash)
    // and the shuffle key is the 8-byte hash, not the document text: the
    // exchange partitions on the xxhash64 grouping expression (a long),
    // never on the string column's attribute
    val df = Dedup.exactDupGroupsByHash(docs, "doc_id", "text")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exch = plan.linesIterator.filter(_.contains("hashpartitioning")).toSeq
    assert(exch.nonEmpty && exch.forall(!_.contains("text#")), exch.mkString("\n"))
  }

  test("word jaccard: exact dup = 1.0, near dup high, unrelated filtered") {
    val pairs = Dedup.wordJaccardPairs(docs, "doc_id", "text", 0.5).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Double]("jaccard"))
      .toMap
    assert(pairs((1L, 2L)) == 1.0)
    // 1 vs 3: 8 shared distinct words of 9 union ("jumps"/"leaps" differ;
    // "the" dedups) — jaccard 7/9
    assert(math.abs(pairs((1L, 3L)) - 7.0 / 9.0) < 1e-9)
    assert(!pairs.contains((1L, 4L)))
  }

  test("ngram jaccard: exact dup = 1.0, shingle grain separates near dups") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, 0.2).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Double]("jaccard"))
      .toMap
    assert(pairs((1L, 2L)) == 1.0)
    // 1 vs 3 share 4 of 7 distinct 3-shingles each (the window around
    // jumps/leaps breaks 3), union 10 → 0.4: shingles punish the edit
    // harder than the 7/9 word-set score
    assert(math.abs(pairs((1L, 3L)) - 0.4) < 1e-9)
    assert(!pairs.contains((1L, 4L)))
  }

  test("word jaccard: exact-boundary pairs survive IEEE rounding in the " +
    "prefix length") {
    import spark.implicits._
    // 100×0.07 = 7.000000000000001 in IEEE double: a bare ceil turns the
    // required overlap into 8, shortening doc x's prefix past its 7
    // shared (highest-df, hence last-ordered) tokens — the exact-boundary
    // pair J = 7/100 = 0.07 >= t was silently never generated
    val xTokens = (1 to 100).map(i => f"w$i%03d")
    val yTokens = xTokens.takeRight(7)
    val docs = Seq((1L, xTokens.mkString(" ")), (2L, yTokens.mkString(" ")))
      .toDF("doc_id", "text")
    val pairs = Dedup.wordJaccardPairs(docs, "doc_id", "text",
        threshold = 0.07)
      .select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.length == 1 && pairs.head._3 == 0.07,
      s"exact-boundary pair missing or misscored: ${pairs.toSeq}")
  }

  test("simhash maxHamming=0 blocks on the FULL 64-bit hash, not one " +
    "degenerate bucket; negative maxHamming rejected") {
    import spark.implicits._
    // distinct texts with distinct simhashes plus one exact pair: at
    // maxHamming=0 only hamming-0 (identical-hash) pairs may surface,
    // and the blocked join must actually block (the shift-mod-64 mask
    // bug put EVERY row in one bucket = an all-pairs cross join)
    val docs = Seq(
      (1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "one two three four five six"), (4L, "totally different text here"))
      .toDF("doc_id", "text")
    val got = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 0)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSet == Set((1L, 2L)), s"got ${got.toSeq}")
    intercept[IllegalArgumentException] {
      Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = -1)
    }
  }

  test("minhash LSH finds exact and near dups with est_jaccard ~ true jaccard") {
    val cand = Dedup.minHashLshCandidates(docs, "doc_id", "text",
      shingleSize = 2, bands = 16, rowsPerBand = 4).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Double]("est_jaccard"))
      .toMap
    assert(cand((1L, 2L)) == 1.0)
    assert(cand.get((1L, 3L)).exists(_ > 0.3)) // shingle-level overlap
  }

  test("simhash: exact dup has hamming 0 and survives the blocked join") {
    val nd = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 3).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Long]("hamming"))
      .toMap
    assert(nd((1L, 2L)) == 0L)
  }

  // ---- native signature expressions (sql/graft/SignatureExprs.scala) ----

  // plain-Scala replicas of the REPLACED UDFs — the expressions must be
  // bit-identical (same trim/lower/split, same seeded MurmurHash3)
  private def refMinhash(text: String, shingleSize: Int, numHashes: Int): Seq[Int] = {
    import scala.util.hashing.MurmurHash3
    val sig = Array.fill(numHashes)(Int.MaxValue)
    if (text != null) {
      // the kernel contract: split's phantom "" is not a token; a
      // non-blank doc shorter than shingleSize hashes one whole-sequence
      // shingle (all short docs used to share the all-sentinel signature)
      val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      def hashShingle(sh: String): Unit = {
        var h = 0
        while (h < numHashes) {
          val v = MurmurHash3.stringHash(sh, h * 0x9e3779b9 + 1)
          if (v < sig(h)) sig(h) = v
          h += 1
        }
      }
      if (toks.nonEmpty && toks.length < shingleSize)
        hashShingle(toks.mkString(" "))
      else {
        var i = 0
        while (i + shingleSize <= toks.length) {
          hashShingle(toks.slice(i, i + shingleSize).mkString(" "))
          i += 1
        }
      }
    }
    sig.toSeq
  }

  private def refSimhash(text: String): Long = {
    import scala.util.hashing.MurmurHash3
    val acc = new Array[Int](64)
    if (text != null) {
      text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).foreach { t =>
        val h = (MurmurHash3.stringHash(t, 7).toLong << 32) |
          (MurmurHash3.stringHash(t, 13).toLong & 0xffffffffL)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  test("short documents get content-derived MinHash signatures, not a " +
    "shared all-sentinel one; blank hashes like null") {
    import spark.implicits._
    // two UNRELATED 2-word docs at the default shingleSize=3: no shingle
    // used to exist, both signed all-MaxValue, and every short doc in a
    // corpus became a mutual 'exact duplicate' (est 1.0)
    val docs = Seq((1L, "hello world"), (2L, "quantum physics"),
      (3L, "hello world"), (4L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val pairs = Dedup.minHashLshCandidates(docs, "doc_id", "text")
      .filter(col("est_jaccard") >= 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((1L, 3L)),
      s"short-doc signatures collided or true dup missed: ${pairs.toSeq}")
    // blank text carries no tokens: same empty signature as null (split's
    // phantom "" token is not a token), on both kernels
    val edge = Seq((1L, "   "), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val sigs = edge.select(
      graft.functions.VectorExpressions.minhashSig(col("text"),
        new org.apache.spark.sql.graft.MinHashKernel(3, 16)).as("mh"),
      graft.functions.VectorExpressions.simhash64(col("text")).as("sh"))
      .collect().map(r => (r.getSeq[Int](0), r.getLong(1)))
    assert(sigs(0) == sigs(1), "blank and null documents signed differently")
    assert(sigs(0)._2 == 0L, "blank simhash is not the empty-document 0")
    // kernel params are validated at construction
    intercept[IllegalArgumentException](
      new org.apache.spark.sql.graft.MinHashKernel(0, 16))
    intercept[IllegalArgumentException](
      new org.apache.spark.sql.graft.MinHashKernel(3, -1))
  }

  test("native signature expressions are bit-identical to the replaced UDFs") {
    import graft.functions.VectorExpressions
    val kernel = new org.apache.spark.sql.graft.MinHashKernel(3, 16)
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "  Mixed CASE   with\t tabs and  runs of   spaces "),
      (3L, "short"),
      (4L, ""),
      (5L, null: String))
    val got = texts.toDF("id", "text")
      .select(col("id"), col("text"),
        VectorExpressions.minhashSig(col("text"), kernel).as("mh"),
        VectorExpressions.simhash64(col("text")).as("sh"))
      .collect()
    got.foreach { r =>
      val t = r.getAs[String]("text")
      assert(r.getAs[scala.collection.Seq[Int]]("mh").toSeq == refMinhash(t, 3, 16),
        s"minhash for '$t'")
      assert(r.getAs[Long]("sh") == refSimhash(t), s"simhash for '$t'")
      assert(!r.isNullAt(2) && !r.isNullAt(3), "signatures are non-nullable")
    }
  }

  test("signature expressions stay inside whole-stage codegen over a real scan") {
    import graft.functions.VectorExpressions
    val kernel = new org.apache.spark.sql.graft.MinHashKernel(3, 64)
    val df = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(VectorExpressions.minhashSig(col("text"), kernel).as("mh"),
        VectorExpressions.simhash64(col("text")).as("sh"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("Project") && l.contains("minhash_sig") && l.contains("*(")),
      s"minhash_sig fell out of the codegen span:\n$plan")
    assert(plan.linesIterator.exists(l =>
      l.contains("Project") && l.contains("simhash64") && l.contains("*(")),
      s"simhash64 fell out of the codegen span:\n$plan")
  }

  private lazy val emb =
    graft.sources.Lake.embeddings(spark, sf0001).select("vec_id", "embedding").cache()

  test("semanticNearDups with nClusters=1 equals the brute-force threshold join") {
    val vecs = emb.collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Float]](1).toArray).toMap
    def cosDist(a: Array[Float], b: Array[Float]): Double = {
      def dot(x: Array[Float], y: Array[Float]) =
        x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
      val den = math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))
      if (den > 0) 1.0 - dot(a, b) / den else 1.0
    }
    val ids = vecs.keys.toSeq.sorted
    val allDists = (for { a <- ids; b <- ids if a < b }
      yield ((a, b), cosDist(vecs(a), vecs(b))))
    // threshold from the data: midpoint between the 50th and 51st
    // smallest pairwise distance — ~50 expected pairs, and the midpoint
    // keeps float-rounding differences between the Spark plan and this
    // double-precision replica away from the decision boundary
    val sorted = allDists.map(_._2).sorted
    val tau = (sorted(49) + sorted(50)) / 2
    val expected = allDists.filter(_._2 <= tau).map(_._1).toSet
    assert(expected.size == 50, s"fixture sanity: ${expected.size} pairs")
    val got = Dedup.semanticNearDups(emb, "vec_id", "embedding", tau,
        nClusters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected, s"got ${got.size} pairs, expected ${expected.size}")
  }

  test("semanticNearDups blocked: scaled copies always co-block and pair at 0") {
    val copies = emb.select((col("vec_id") + 10000).as("vec_id"),
      transform(col("embedding"), x => (x * lit(2.0d)).cast("float"))
        .as("embedding"))
    val n = emb.count()
    val pairs = Dedup.semanticNearDups(emb.unionByName(copies),
        "vec_id", "embedding", maxCosineDistance = 1e-6,
        nClusters = 4, assignProbes = 2)
      .filter(col("id_b") === col("id_a") + 10000)
      .collect()
    assert(pairs.length == n, s"recovered ${pairs.length} of $n scaled copies")
    assert(pairs.forall(_.getDouble(2) <= 1e-6))
  }

  test("semanticNearDups: PERTURBED copies recovered, recall monotone in probes") {
    // the claim SemDeDup actually makes: near-duplicates (small angular
    // noise, not exact copies) must co-block. Deterministic ±30%
    // per-element jitter keyed on (id, position) lands the true cos_dist
    // in the ~0.005–0.03 band — above exact-dup zero, below the 0.05
    // threshold.
    val perturbed = emb.select((col("vec_id") + 10000).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        (x * (lit(1.0) + (hash(col("vec_id"), i) % 301) / lit(1000.0)))
          .cast("float")).as("embedding"))
    val corpus = emb.unionByName(perturbed)
    val n = emb.count()
    // fixture sanity: the injected pairs really are in the intended band
    val bands = graft.knn.KnnJoin.broadcastKnn(
        perturbed, emb, "vec_id", "embedding", 1,
        graft.knn.KnnJoin.MetricCosine, excludeSelf = false)
      .filter(col("query_id") === col("neighbor_id") + 10000)
      .select("dist").collect().map(_.getDouble(0))
    assert(bands.length == n)
    assert(bands.forall(d => d > 1e-4 && d < 0.05),
      s"perturbation band off: min=${bands.min} max=${bands.max}")
    val hits = Seq(1, 2, 4).map { p =>
      Dedup.semanticNearDups(corpus, "vec_id", "embedding",
          maxCosineDistance = 0.05, nClusters = 16, assignProbes = p)
        .filter(col("id_b") === col("id_a") + 10000)
        .count()
    }
    info(s"perturbed-copy recall by probes: " +
      hits.zip(Seq(1, 2, 4)).map { case (h, p) => s"p$p=${h.toDouble / n}" }
        .mkString(" "))
    // multi-probe assignment sets are nested ⟹ recall is monotone EXACTLY
    assert(hits(0) <= hits(1) && hits(1) <= hits(2),
      s"recall not monotone in probes: $hits")
    assert(hits(2) >= (n * 0.8 + 0.5).toLong,
      s"probes=4 recall ${hits(2).toDouble / n} below 0.8 floor")
  }

  test("semanticNearDups probeLevel: level-filtered pairs equal a separate run per probe count") {
    // the q73 fusion's correctness claim: nearestN orders probes by
    // (dist, idx), so one probes=4 run with probe_level carries every
    // smaller probe count's EXACT pair set as filter(probe_level <= p)
    val perturbed = emb.select((col("vec_id") + 10000).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        (x * (lit(1.0) + (hash(col("vec_id"), i) % 301) / lit(1000.0)))
          .cast("float")).as("embedding"))
    val corpus = emb.unionByName(perturbed)
    val leveled = Dedup.semanticNearDups(corpus, "vec_id", "embedding",
        maxCosineDistance = 0.05, nClusters = 16, assignProbes = 4,
        probeLevel = true)
      .select("id_a", "id_b", "cos_dist", "probe_level").collect()
    Seq(1, 2, 4).foreach { p =>
      val separate = Dedup.semanticNearDups(corpus, "vec_id", "embedding",
          maxCosineDistance = 0.05, nClusters = 16, assignProbes = p)
        .select("id_a", "id_b", "cos_dist").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val filtered = leveled.filter(_.getInt(3) <= p)
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(filtered == separate,
        s"probeLevel<=$p pair set diverges from assignProbes=$p run: " +
          s"${(filtered -- separate).take(3)} vs ${(separate -- filtered).take(3)}")
    }
  }

  test("semanticNearDups blockCap: oversized blocks split, exact dups survive") {
    import spark.implicits._
    // degenerate corpus: one dominant direction (a cone wider than the
    // threshold), so top-level clustering swallows everything into a few
    // hot blocks — the case where the within-block join goes quadratic
    val rnd = new scala.util.Random(13)
    val base = (0L until 400L).map { i =>
      val v = Array(10f, 0f, 0f, 0f)
      (i, v.zipWithIndex.map { case (x, j) =>
        x + (if (j > 0) (rnd.nextGaussian() * 1.2).toFloat else 0f) })
    }
    val copies = base.take(30).map { case (i, v) =>
      (i + 100000L, v.map(_ * 3f)) }
    val corpus = (base ++ copies).toDF("id", "v")
    val capped = Dedup.semanticNearDups(corpus, "id", "v",
      maxCosineDistance = 1e-6, nClusters = 4, assignProbes = 2,
      blockCap = 100, subClusters = 8)
      .filter(col("id_b") === col("id_a") + 100000)
      .collect()
    // same direction ⇒ same top cid AND same sub cell: every copy found
    assert(capped.length == 30, s"recovered ${capped.length}/30 under blockCap")
    // and the cap genuinely subdivided the work: no (cid, sub) bucket
    // anywhere near the corpus size (the uncapped hot block holds most
    // of the 430×2 probe rows)
    val uncapped = Dedup.semanticNearDups(corpus, "id", "v",
      maxCosineDistance = 1e-6, nClusters = 4, assignProbes = 2)
    assert(uncapped.filter(col("id_b") === col("id_a") + 100000).count() == 30)
  }

  test("nearDupComponents: transitive closure to min-id labels, drop list") {
    import spark.implicits._
    // {1,2,3,4} as a path (3-hop diameter), {10,11}, {20,21,22} as a fork,
    // and a 10-edge chain 100..110 to force multiple propagation rounds
    val chain = (100L until 110L).map(i => (i, i + 1))
    val pairs = (Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L)) ++ chain).toDF("id_a", "id_b")
    val comp = Dedup.nearDupComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected =
      Seq(1L, 2L, 3L, 4L).map(_ -> 1L) ++
        Seq(10L, 11L).map(_ -> 10L) ++
        Seq(20L, 21L, 22L).map(_ -> 20L) ++
        (100L to 110L).map(_ -> 100L)
    assert(comp == expected.toMap)
    val dropped = Dedup.nearDupDropList(pairs).collect()
      .map(_.getLong(0)).toSet
    assert(dropped == expected.toMap.keySet -- Set(1L, 10L, 20L, 100L))
  }

  test("nearDupComponents: rounds track diameter, NOT corpus size (scale contract)") {
    import spark.implicits._
    // the q66-at-10× growth question (round-11 probe's worst, 4.8×):
    // the iteration count must be a function of component DIAMETER
    // alone — replicating the same graph shape 10× (disjoint id ranges)
    // must not add a single round. The per-round work grows with data,
    // the number of rounds does not; growth is therefore bounded by
    // rounds(diameter) × per-round-linear.
    def pathGraph(copies: Int): org.apache.spark.sql.DataFrame =
      (0 until copies).flatMap { c =>
        (0L until 8L).map(i => (c * 1000L + i, c * 1000L + i + 1))
      }.toDF("id_a", "id_b")
    val (one, r1) = Dedup.nearDupComponentsWithRounds(pathGraph(1), 20)
    val (ten, r10) = Dedup.nearDupComponentsWithRounds(pathGraph(10), 20)
    assert(r10 == r1, s"rounds grew with replication: $r1 → $r10")
    assert(one.count() == 9 && ten.count() == 90)
    // and the labels are still the transitive-closure minimum per copy
    assert(ten.collect().forall(r => r.getLong(1) == (r.getLong(0) / 1000L) * 1000L))
    // q66's own graph shape (disjoint pairs, diameter 1) settles in the
    // minimum possible 2 rounds: one delivery + one empty-frontier check
    val pairs = (0L until 100L).map(i => (i, i + 1000000L)).toDF("id_a", "id_b")
    val (_, rPairs) = Dedup.nearDupComponentsWithRounds(pairs, 20)
    assert(rPairs <= 2, s"diameter-1 graph took $rPairs rounds")
  }

  test("nearDupComponents: diameter beyond maxIters fails loudly") {
    import spark.implicits._
    val chain = (0L until 30L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    intercept[IllegalArgumentException] {
      Dedup.nearDupComponents(chain, maxIters = 3)
    }
    // and succeeds when the cap covers the diameter
    val ok = Dedup.nearDupComponents(chain, maxIters = 40).collect()
    assert(ok.forall(_.getLong(1) == 0L))
  }

  test("semanticNearDups → components: scaled-copy pairs are 2-id groups") {
    val copies = emb.select((col("vec_id") + 10000).as("vec_id"),
      transform(col("embedding"), x => (x * lit(2.0d)).cast("float"))
        .as("embedding"))
    val pairs = Dedup.semanticNearDups(emb.unionByName(copies),
      "vec_id", "embedding", maxCosineDistance = 1e-6,
      nClusters = 4, assignProbes = 2)
    val comp = Dedup.nearDupComponents(pairs)
    // every copy labels back to its original; originals label themselves
    assert(comp.filter(col("id") >= 10000L)
      .filter(col("component") =!= col("id") - 10000L).count() == 0)
  }

  test("leakageSafeSplit: near-dup groups never straddle the boundary") {
    import spark.implicits._
    // 600 docs; pairs chain 0~1~2, 10~11, and a cross-id-range pair
    val docs = (0L until 600L).toDF("id")
    val pairs = Seq((0L, 1L), (1L, 2L), (10L, 11L), (5L, 599L))
      .toDF("id_a", "id_b")
    val split = Dedup.leakageSafeSplit(docs, "id", pairs, testFrac = 0.3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(split.size == 600)
    // every paired group shares one side AND one component
    for (group <- Seq(Seq(0L, 1L, 2L), Seq(10L, 11L), Seq(5L, 599L))) {
      assert(group.map(split(_)._2).distinct.size == 1,
        s"group $group straddles the split")
      assert(group.map(split(_)._1).distinct.size == 1)
    }
    // the test fraction lands near the target over ~595 components
    val testRate = split.values.count(_._2).toDouble / split.size
    assert(math.abs(testRate - 0.3) < 0.08, s"test rate $testRate")
    // degenerate fractions
    assert(Dedup.leakageSafeSplit(docs, "id", pairs, 0.0)
      .filter(col("is_test")).count() == 0)
    assert(Dedup.leakageSafeSplit(docs, "id", pairs, 1.0)
      .filter(!col("is_test")).count() == 0)
  }

  test("semanticNearDups: zero vectors never pair (distance-1.0 convention)") {
    import spark.implicits._
    val withZeros = emb.unionByName(
      Seq((90001L, Array.fill(64)(0.0f)), (90002L, Array.fill(64)(0.0f)))
        .toDF("vec_id", "embedding"))
    val zeroPairs = Dedup.semanticNearDups(withZeros, "vec_id", "embedding",
        maxCosineDistance = 0.999, nClusters = 4, assignProbes = 2)
      .filter(col("id_a") >= 90000L || col("id_b") >= 90000L)
      .count()
    assert(zeroPairs == 0)
  }
}
