package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.core.TxnTable
import graft.operators.Dedup

/** The incremental near-dup protocol, pinned:
  *  - the kept set is IDENTICAL whether the corpus arrives as 1, 3, or
  *    5 id-ordered micro-batches (batching independence — the property
  *    that makes a streaming dedup trustworthy);
  *  - it equals the batch rule "drop d iff a lower-id document shares
  *    a MinHash band" computed by Dedup.minHashBandedPairs;
  *  - a redelivered micro-batch (crash-recovery replay) changes
  *    nothing in either table (exactly-once via the TxnTable log).
  */
class StreamDedupSpec extends SparkSpecBase {
  import spark.implicits._

  // 30 docs, ids 0..29: three planted exact-dup clusters (ids sharing
  // text collide in every band), plus unique docs and <3-token docs
  // that can never collide.
  private lazy val corpus = {
    val base = Seq(
      "the quick brown fox jumps over the lazy dog tonight",
      "colorless green ideas sleep furiously every single night",
      "a b",
      "pack my box with five dozen liquor jugs right now")
    (0 until 30).map { i =>
      val text = (i % 10) match {
        case 0 => base(0)
        case 1 => base(1)
        case 2 => base(2)
        case 3 => s"unique document number $i with plenty of words inside it"
        case _ => s"filler text $i " + base(i % 4)
      }
      (i.toLong, text, if (i < 15) "a" else "b")
    }.toDF("doc_id", "text", "source")
  }

  private def runSplit(nBatches: Int): (Set[Long], String) = {
    val store = Files.createTempDirectory("graft_sdd_store").toString + "/t"
    val kept = Files.createTempDirectory("graft_sdd_kept").toString + "/t"
    val step = 30 / nBatches + (if (30 % nBatches == 0) 0 else 1)
    (0 until nBatches).foreach { b =>
      val batch = corpus.filter(
        col("doc_id") >= b * step && col("doc_id") < (b + 1) * step)
      StreamDedup.processBatch(spark, batch, b.toLong, store, kept, "spec")
    }
    val ids = TxnTable.read(spark, kept)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    (ids, kept)
  }

  test("kept set is independent of how the stream was batched") {
    val (one, _) = runSplit(1)
    val (three, _) = runSplit(3)
    val (five, _) = runSplit(5)
    assert(one == three && three == five)
    assert(one.nonEmpty && one.size < 30, "dedup must actually drop docs")
  }

  test("stream equals the batch lower-id-wins banding rule") {
    val (streamKept, _) = runSplit(3)
    val dropped = Dedup.minHashBandedPairs(corpus, "text", "doc_id")
      .select(col("b_id")).collect().map(_.getLong(0)).toSet
    val batchKept = (0L until 30L).toSet -- dropped
    assert(streamKept == batchKept)
    // the <3-token docs (ids 2, 12, 22 share "a b") have no shingles,
    // no signatures, and must all survive
    assert(Set(2L, 12L, 22L).subsetOf(streamKept))
  }

  test("out-of-order arrival + reconcile equals the batch rule") {
    val store = Files.createTempDirectory("graft_sdd_store").toString + "/t"
    val kept = Files.createTempDirectory("graft_sdd_kept").toString + "/t"
    // adversarial order: high ids first, so every cluster's winner
    // (its LOWEST id) arrives last and the early keeps are wrong
    (0 until 3).foreach { b =>
      val batch = corpus.filter(col("doc_id") % 3 === (2 - b))
      StreamDedup.processBatch(spark, batch, b.toLong, store, kept, "ooo")
    }
    val preRepair = TxnTable.read(spark, kept)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val dropped = Dedup.minHashBandedPairs(corpus, "text", "doc_id")
      .select(col("b_id")).collect().map(_.getLong(0)).toSet
    val batchKept = (0L until 30L).toSet -- dropped
    assert(preRepair != batchKept,
      "the adversarial order must actually create wrongly-kept docs")
    // nothing is ever wrongly DROPPED — only wrongly kept
    assert(batchKept.subsetOf(preRepair))
    StreamDedup.reconcile(spark, store, kept)
    val postRepair = TxnTable.read(spark, kept)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(postRepair == batchKept)
    // idempotent: a second reconcile is a no-op version-wise
    val v = TxnTable.currentVersion(kept)
    StreamDedup.reconcile(spark, store, kept)
    assert(TxnTable.currentVersion(kept) == v)
  }

  test("all-new batches read ZERO store files (bloom gate + pruning)") {
    val store = Files.createTempDirectory("graft_sdd_store").toString + "/t"
    val kept = Files.createTempDirectory("graft_sdd_kept").toString + "/t"
    // 6 batches of globally-unique docs: after batch 0, every batch
    // still consults the accumulated store — but the bloom gate must
    // reject every key, so the store read is skipped entirely and the
    // per-batch cost stays FLAT no matter how much history exists
    val uniq = (0 until 60).map(i =>
      (i.toLong, s"totally unique document number $i carrying payload " +
        s"alpha$i beta$i gamma$i delta$i", "u")).toDF("doc_id", "text", "source")
    StreamDedup.scanLog.clear()
    (0 until 6).foreach { b =>
      StreamDedup.processBatch(spark,
        uniq.filter(col("doc_id") >= b * 10 && col("doc_id") < (b + 1) * 10),
        b.toLong, store, kept, "flat")
    }
    import scala.jdk.CollectionConverters._
    val scans = StreamDedup.scanLog.asScala.filter(_.streamId == "flat")
    assert(scans.size == 5, "batches 1..5 each consult the store")
    assert(scans.forall(s => s.filesRead == 0 && s.candBuckets == 0),
      s"expected zero store files read for all-new batches, got $scans")
    // the store's live file count GREW the whole time — the flat read
    // is pruning, not an empty store
    assert(scans.last.filesLive > scans.head.filesLive)
    assert(TxnTable.read(spark, kept).count() == 60)
  }

  test("duplicate batch reads a PRUNED store slice, not the snapshot") {
    val store = Files.createTempDirectory("graft_sdd_store").toString + "/t"
    val kept = Files.createTempDirectory("graft_sdd_kept").toString + "/t"
    val uniq = (0 until 50).map(i =>
      (i.toLong, s"base document $i with words epsilon$i zeta$i eta$i " +
        s"theta$i iota$i", "u")).toDF("doc_id", "text", "source")
    (0 until 5).foreach { b =>
      StreamDedup.processBatch(spark,
        uniq.filter(col("doc_id") >= b * 10 && col("doc_id") < (b + 1) * 10),
        b.toLong, store, kept, "dup")
    }
    StreamDedup.scanLog.clear()
    // one exact dup of doc 7 (same text → same bands → bloom-positive)
    val dupBatch = Seq((100L,
      "base document 7 with words epsilon7 zeta7 eta7 theta7 iota7", "u"))
      .toDF("doc_id", "text", "source")
    StreamDedup.processBatch(spark, dupBatch, 5L, store, kept, "dup")
    import scala.jdk.CollectionConverters._
    val s = StreamDedup.scanLog.asScala.find(_.streamId == "dup").get
    assert(s.candBuckets > 0 && s.candBuckets <= 4,
      s"dup doc has ≤bands candidate buckets, got ${s.candBuckets}")
    assert(s.filesRead > 0 && s.filesRead < s.filesLive,
      s"expected a strict subset of ${s.filesLive} files, read ${s.filesRead}")
    // and the dup was actually dropped
    assert(!TxnTable.read(spark, kept).select(col("doc_id"))
      .collect().map(_.getLong(0)).contains(100L))
  }

  test("bloom sidecar folds; store compaction keeps dup reads tight") {
    val store = Files.createTempDirectory("graft_sdd_store").toString + "/t"
    val kept = Files.createTempDirectory("graft_sdd_kept").toString + "/t"
    val uniq = (0 until 85).map(i =>
      (i.toLong, s"corpus item $i holding kappa$i lambda$i mu$i nu$i xi$i",
        "u")).toDF("doc_id", "text", "source")
    // small buckets + tiny compaction trigger exercise both maintenance
    // loops inside a spec-sized run; 17 batches cross the sidecar's
    // 16-commit fold cadence
    (0 until 17).foreach { b =>
      StreamDedup.processBatch(spark,
        uniq.filter(col("doc_id") >= b * 5 && col("doc_id") < (b + 1) * 5),
        b.toLong, store, kept, "fold", nStoreBuckets = 8,
        compactStoreAtFiles = 12)
    }
    // sidecar stayed bounded: the cadence fold collapsed it to ≤ one
    // row per bucket plus the post-fold batch's rows
    val bloomRows = TxnTable.read(spark, store + "_bloom").count()
    assert(bloomRows <= 16, s"bloom sidecar must fold, has $bloomRows rows")
    // store was compacted at least once and stayed under ~trigger size
    assert(TxnTable.snapshotFiles(store).size <= 12 + 4,
      "store compaction must bound the live file count")
    // correctness through both maintenance loops: a dup is still caught
    StreamDedup.scanLog.clear()
    val dup = Seq((200L,
      "corpus item 3 holding kappa3 lambda3 mu3 nu3 xi3", "u"))
      .toDF("doc_id", "text", "source")
    StreamDedup.processBatch(spark, dup, 17L, store, kept, "fold",
      nStoreBuckets = 8, compactStoreAtFiles = 12)
    assert(!TxnTable.read(spark, kept).select(col("doc_id"))
      .collect().map(_.getLong(0)).contains(200L))
    import scala.jdk.CollectionConverters._
    val s = StreamDedup.scanLog.asScala.find(_.streamId == "fold").get
    assert(s.filesRead < s.filesLive,
      s"post-compaction dup read must stay pruned: $s")
  }

  test("a SATURATED bloom degrades to extra reads, never wrong answers") {
    // 8-byte per-bucket filters (64 bits) saturate immediately at these
    // key counts — the gate must degrade to "read the candidate
    // buckets", not to false negatives (impossible by construction) or
    // wrong results
    val store = Files.createTempDirectory("graft_sdd_store").toString + "/t"
    val kept = Files.createTempDirectory("graft_sdd_kept").toString + "/t"
    (0 until 3).foreach { b =>
      StreamDedup.processBatch(spark,
        corpus.filter(col("doc_id") >= b * 10 && col("doc_id") < (b + 1) * 10),
        b.toLong, store, kept, "sat", bloomBytesPerBucket = 8)
    }
    val satKept = TxnTable.read(spark, kept)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val dropped = Dedup.minHashBandedPairs(corpus, "text", "doc_id")
      .select(col("b_id")).collect().map(_.getLong(0)).toSet
    assert(satKept == (0L until 30L).toSet -- dropped,
      "saturation changed the dedup result")
  }

  test("embedding near-dup: batching-independent, equals the LSH band rule") {
    import graft.operators.Similarity
    // 24 8-dim vectors: pairs (i, i+12) are identical → same signature
    // → collide on every band; the rest are sign-diverse
    val embCorpus = (0 until 24).map { i =>
      val j = i % 12
      (i.toLong, (0 until 8).map(d =>
        (if (((j >> (d % 4)) & 1) == 1) 1.0f else -1.0f) *
          (1.0f + 0.1f * ((j * 3 + d) % 5))))
    }.toDF("vec_id", "embedding")
    def runEmb(nBatches: Int): Set[Long] = {
      val store = Files.createTempDirectory("graft_sde_store").toString + "/t"
      val kept = Files.createTempDirectory("graft_sde_kept").toString + "/t"
      val step = 24 / nBatches
      (0 until nBatches).foreach { b =>
        StreamDedup.processEmbeddingBatch(spark,
          embCorpus.filter(col("vec_id") >= b * step &&
            col("vec_id") < (b + 1) * step),
          b.toLong, store, kept, s"emb$nBatches", dim = 8, bits = 8,
          bands = 2)
      }
      TxnTable.read(spark, kept)
        .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    }
    val one = runEmb(1)
    val three = runEmb(3)
    assert(one == three, "embedding dedup must be batching-independent")
    // the REAL stream wrapper lands in the same place (foreachBatch
    // plumbing + exactly-once commits over the same protocol)
    val streamed = {
      val staging = Files.createTempDirectory("graft_sde_in").toString
      embCorpus.coalesce(1).write.mode("overwrite").parquet(staging)
      val store = Files.createTempDirectory("graft_sde_s2").toString + "/t"
      val kept = Files.createTempDirectory("graft_sde_k2").toString + "/t"
      val sch = spark.read.parquet(staging).schema
      StreamDedup.runEmbeddingNearDupStream(spark,
        spark.readStream.schema(sch).parquet(staging),
        store, kept, "embstream", dim = 8, bits = 8, bands = 2)
      TxnTable.read(spark, kept)
        .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    }
    assert(streamed == one, "real-stream wrapper drifted from the protocol")
    // batch rule oracle: drop v iff a lower-id vector shares a band
    val r = 8 / 2
    val sig = Similarity.withLshSignature(embCorpus, 8, 8, 42L,
        "embedding", "__sig")
      .select(col("vec_id"), col("__sig"))
    val banded = sig.select(col("vec_id"),
      explode(array((0 until 2).map(b =>
        struct(lit(b).as("b"),
          shiftright(col("__sig"), r * b).bitwiseAND(lit((1 << r) - 1))
            .as("k"))): _*)).as("bk"))
      .select(col("vec_id"), col("bk.b"), col("bk.k"))
    val dropped = banded.as("a").join(banded.as("e"),
        col("a.b") === col("e.b") && col("a.k") === col("e.k") &&
          col("e.vec_id") < col("a.vec_id"), "left_semi")
      .select(col("a.vec_id")).collect().map(_.getLong(0)).toSet
    assert(one == (0L until 24L).toSet -- dropped)
    // the planted identical pairs were actually deduped
    assert((12L until 24L).forall(i => !one.contains(i)),
      "identical twin vectors must all drop")
  }

  private def rmTree(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try {
        val it = s.iterator()
        while (it.hasNext) rmTree(it.next())
      } finally s.close()
    }
    Files.deleteIfExists(p)
    ()
  }

  test("legacy store without a sidecar gets a FULL bloom backfill on contact") {
    val store = Files.createTempDirectory("graft_sdl_store").toString + "/t"
    val kept = Files.createTempDirectory("graft_sdl_kept").toString + "/t"
    val uniq = (0 until 30).map(i =>
      (i.toLong, s"legacy item $i carrying omicron$i pi$i rho$i sigma$i",
        "u")).toDF("doc_id", "text", "source")
    (0 until 2).foreach { b =>
      StreamDedup.processBatch(spark,
        uniq.filter(col("doc_id") >= b * 10 && col("doc_id") < (b + 1) * 10),
        b.toLong, store, kept, "leg")
    }
    // simulate a store written before the sidecar existed
    rmTree(java.nio.file.Paths.get(store + "_bloom"))
    // first contact is an ALL-NEW batch: without the backfill this
    // creates a sidecar covering only its own keys…
    StreamDedup.processBatch(spark,
      uniq.filter(col("doc_id") >= 20), 2L, store, kept, "leg")
    // …and a later dup of a PRE-SIDECAR doc would then be bloom-
    // rejected before the store probe — a silently missed duplicate
    StreamDedup.scanLog.clear()
    val dup = Seq((100L,
      "legacy item 3 carrying omicron3 pi3 rho3 sigma3", "u"))
      .toDF("doc_id", "text", "source")
    StreamDedup.processBatch(spark, dup, 3L, store, kept, "leg")
    assert(!TxnTable.read(spark, kept).select(col("doc_id"))
      .collect().map(_.getLong(0)).contains(100L),
      "dup of a pre-sidecar doc must still be dropped")
    import scala.jdk.CollectionConverters._
    val s = StreamDedup.scanLog.asScala.find(_.streamId == "leg").get
    assert(s.filesRead > 0, "the backfilled bloom must admit the dup's keys")
  }

  test("tiny store-compaction trigger compacts to >=1 file, never throws") {
    // compactStoreAtFiles in 1..3 used to floor targetFiles to 0 and
    // fail the micro-batch inside repartitionByRange
    val store = Files.createTempDirectory("graft_sdc_store").toString + "/t"
    val kept = Files.createTempDirectory("graft_sdc_kept").toString + "/t"
    (0 until 2).foreach { b =>
      StreamDedup.processBatch(spark,
        corpus.filter(col("doc_id") >= b * 10 && col("doc_id") < (b + 1) * 10),
        b.toLong, store, kept, "tiny", compactStoreAtFiles = 2)
    }
    assert(TxnTable.snapshotFiles(store).size >= 1)
    // dedup still correct through the aggressive compaction
    val dup = Seq((200L, "the quick brown fox jumps over the lazy dog tonight",
      "u")).toDF("doc_id", "text", "source")
    StreamDedup.processBatch(spark, dup, 2L, store, kept, "tiny",
      compactStoreAtFiles = 2)
    assert(!TxnTable.read(spark, kept).select(col("doc_id"))
      .collect().map(_.getLong(0)).contains(200L))
  }

  test("bloom sizing drift across restarts self-heals, never poisons") {
    val store = Files.createTempDirectory("graft_sds_store").toString + "/t"
    val kept = Files.createTempDirectory("graft_sds_kept").toString + "/t"
    val uniq = (0 until 30).map(i =>
      (i.toLong, s"drift item $i carrying tau$i upsilon$i phi$i chi$i",
        "u")).toDF("doc_id", "text", "source")
    (0 until 2).foreach { b =>
      StreamDedup.processBatch(spark,
        uniq.filter(col("doc_id") >= b * 10 && col("doc_id") < (b + 1) * 10),
        b.toLong, store, kept, "drift", bloomBytesPerBucket = 1024)
    }
    // "restart" with a different sizing: this batch's sidecar rows
    // commit at the new size, leaving the sidecar mixed-length
    StreamDedup.processBatch(spark,
      uniq.filter(col("doc_id") >= 20), 2L, store, kept, "drift",
      bloomBytesPerBucket = 4096)
    // the next probe hits the mixed sidecar: it must rebuild at the
    // current size (one repair scan) and still catch a dup of a doc
    // committed under the OLD sizing — not fail every batch forever
    val dup = Seq((100L, "drift item 5 carrying tau5 upsilon5 phi5 chi5",
      "u")).toDF("doc_id", "text", "source")
    StreamDedup.processBatch(spark, dup, 3L, store, kept, "drift",
      bloomBytesPerBucket = 4096)
    assert(!TxnTable.read(spark, kept).select(col("doc_id"))
      .collect().map(_.getLong(0)).contains(100L))
    // healed: the sidecar is uniformly sized again
    val lens = TxnTable.read(spark, store + "_bloom")
      .select(length(col("bloom"))).collect().map(_.getInt(0)).toSet
    assert(lens.size == 1, s"sidecar still mixed-size after heal: $lens")
  }

  test("a saturated sidecar AUTO-GROWS at fold and regains zero-read pruning") {
    val store = Files.createTempDirectory("graft_sdg_store").toString + "/t"
    val kept = Files.createTempDirectory("graft_sdg_kept").toString + "/t"
    val prevCadence = StreamDedup.BloomFoldCadence
    StreamDedup.BloomFoldCadence = 4
    try {
      // 8-byte filters over 4 buckets saturate within a few batches of
      // unique docs; the fold must then REBUILD the sidecar from the
      // store, sized to the committed key count
      val uniq = (0 until 120).map(i =>
        (i.toLong, s"grow item $i with words psi$i omega$i alef$i bet$i",
          "u")).toDF("doc_id", "text", "source")
      (0 until 12).foreach { b =>
        StreamDedup.processBatch(spark,
          uniq.filter(col("doc_id") >= b * 10 && col("doc_id") < (b + 1) * 10),
          b.toLong, store, kept, "grow", nStoreBuckets = 4,
          bloomBytesPerBucket = 8)
      }
      val lens = TxnTable.read(spark, store + "_bloom")
        .select(length(col("bloom"))).collect().map(_.getInt(0)).toSet
      assert(lens.max > 8, s"sidecar must auto-grow past 8 bytes, got $lens")
      // pruning power restored: an all-new batch reads ZERO store files
      // again (a saturated 64-bit filter passed everything)
      StreamDedup.scanLog.clear()
      val fresh = (200 until 210).map(i =>
        (i.toLong, s"fresh item $i with words gimel$i dalet$i he$i vav$i",
          "u")).toDF("doc_id", "text", "source")
      StreamDedup.processBatch(spark, fresh, 12L, store, kept, "grow",
        nStoreBuckets = 4, bloomBytesPerBucket = 8)
      import scala.jdk.CollectionConverters._
      val s = StreamDedup.scanLog.asScala.find(_.streamId == "grow").get
      assert(s.filesRead == 0 && s.candBuckets == 0,
        s"grown sidecar must gate an all-new batch to zero reads: $s")
      // and a genuine dup of an EARLY (pre-growth) doc is still caught —
      // the rebuild covered the whole committed store
      val dup = Seq((300L, "grow item 7 with words psi7 omega7 alef7 bet7",
        "u")).toDF("doc_id", "text", "source")
      StreamDedup.processBatch(spark, dup, 13L, store, kept, "grow",
        nStoreBuckets = 4, bloomBytesPerBucket = 8)
      assert(!TxnTable.read(spark, kept).select(col("doc_id"))
        .collect().map(_.getLong(0)).contains(300L))
    } finally StreamDedup.BloomFoldCadence = prevCadence
  }

  test("redelivered micro-batch is a no-op on both tables") {
    val store = Files.createTempDirectory("graft_sdd_store").toString + "/t"
    val kept = Files.createTempDirectory("graft_sdd_kept").toString + "/t"
    val b0 = corpus.filter(col("doc_id") < 15)
    val b1 = corpus.filter(col("doc_id") >= 15)
    StreamDedup.processBatch(spark, b0, 0L, store, kept, "spec")
    StreamDedup.processBatch(spark, b1, 1L, store, kept, "spec")
    val keptBefore = TxnTable.read(spark, kept).count()
    val storeBefore = TxnTable.read(spark, store).count()
    val vKept = TxnTable.currentVersion(kept)
    // crash recovery redelivers the last batch
    StreamDedup.processBatch(spark, b1, 1L, store, kept, "spec")
    assert(TxnTable.read(spark, kept).count() == keptBefore)
    assert(TxnTable.read(spark, store).count() == storeBefore)
    assert(TxnTable.currentVersion(kept) == vKept)
  }
}
