package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Op-level semantics of the content-defined substring dedup (p36) —
  * the oracle gate checks corpus-scale parity of spanStats; these pin
  * the properties the corpus query can't isolate: alignment
  * independence of the segmentation, the keep-first-occurrence removal
  * contract, and lossless reassembly for clean documents.
  */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic filler with no 16+-char substring shared between
    * different seeds: every 8-char window embeds the seed and a
    * position counter, so cross-doc k-gram collisions can't happen.
    */
  private def filler(seed: Int, words: Int): String =
    (0 until words).map(i => f"w$seed%02d$i%04d").mkString(" ")

  private val passage =
    "An identical passage planted into several documents at different " +
      "offsets must still be discovered, because segment boundaries " +
      "depend only on the characters at each position and never on the " +
      "position itself within the host document. "

  test("p36: planted passage found at any alignment; clean docs report zero") {
    val docs = Seq(
      (1L, filler(1, 3) + passage + filler(11, 40)),   // ~20-char prefix
      (2L, filler(2, 17) + passage + filler(12, 40)),  // ~150-char prefix
      (3L, filler(3, 31) + passage + filler(13, 40)),  // ~280-char prefix
      (4L, filler(4, 60)),                             // no dup content
      (5L, "short"),                                   // sub-k doc
      (6L, "")).toDF("doc_id", "text")
    val stats = SubstringDedup.spanStats(docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    // the three hosts each contain interior segments of the passage;
    // detection granularity is a segment (expected 64 chars), so at
    // least one shared segment must surface in EVERY host despite the
    // three distinct alignments
    for (id <- Seq(1L, 2L, 3L)) {
      val (dupSegs, dupChars) = stats(id)
      assert(dupSegs >= 1, s"doc $id: planted passage not detected")
      assert(dupChars >= 16, s"doc $id: dup_chars below a single segment")
    }
    assert(stats(4L) == ((0L, 0L)))
    assert(stats(5L) == ((0L, 0L)))
    assert(stats(6L) == ((0L, 0L)))
  }

  test("p36: segmentation is a partition of every document") {
    val docs = Seq(
      (1L, filler(21, 50)), (2L, "tiny"), (3L, "")).toDF("doc_id", "text")
    val segs = SubstringDedup.segments(docs).collect()
    val byDoc = segs.groupBy(_.getLong(0))
    val lens = docs.collect().map(r => r.getLong(0) -> r.getString(1).length).toMap
    for ((id, rows) <- byDoc) {
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.head.getLong(1) == 1L, s"doc $id: first segment not at 1")
      // contiguous, non-overlapping, covering: start_{j+1} = start_j + len_j
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(1) == a.getLong(1) + a.getLong(2),
            s"doc $id: gap or overlap at ${b.getLong(1)}")
        case _ => ()
      }
      assert(sorted.map(_.getLong(2)).sum == lens(id).toLong,
        s"doc $id: segment lengths do not sum to the document length")
      // reassembly is byte-lossless
      assert(sorted.map(_.getString(3)).mkString == docs.collect()
        .find(_.getLong(0) == id).get.getString(1))
    }
  }

  test("p36: an identical-document flood degrades linearly — counts, never pair enumeration") {
    // 2000 byte-identical copies of one page (the web-corpus flood that
    // makes pair-enumerating dedup quadratic: 2000 copies = 2M pairs).
    // The segment pipeline only ever GROUPS AND COUNTS on the segment
    // hash, so the flood is 2000 rows landing on a handful of keys —
    // the same guarantee HotBucketSpec pins for MinHash, here by
    // construction. The output stays per-document and exact.
    val page = filler(51, 40) + " " + filler(52, 40)
    val flood = (1L to 2000L).map(i => (i, page))
    val docs = (flood :+ ((9001L, filler(53, 60)))).toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val stats = SubstringDedup.spanStats(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val wallSec = (System.nanoTime() - t0) / 1e9
    assert(stats.size == 2001)
    // every flood member reports its duplicated segments; the clean doc none
    assert(stats(1L) >= 1L && stats(1L) == stats(2000L))
    assert(stats(9001L) == 0L)
    // linearity guard: a pair-enumerating implementation would build
    // ~2M pairs here and blow far past this generous local[4] budget
    assert(wallSec < 60.0, f"flood took $wallSec%.1f s — not linear?")
  }

  test("p36: removal keeps exactly the globally-first occurrence and leaves clean docs byte-identical") {
    val docs = Seq(
      (1L, filler(31, 3) + passage + filler(41, 40)),
      (2L, filler(32, 17) + passage + filler(42, 40)),
      (3L, filler(33, 60))).toDF("doc_id", "text")
    val cleaned = SubstringDedup.removeDuplicatedSpans(docs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val original = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 3 has no duplicated segments: byte-identical round trip
    assert(cleaned(3L) == original(3L))
    // doc 1 hosts the first occurrence (min (doc_id, seg_start)): the
    // shared interior segments stay, so doc 1 is also unchanged
    assert(cleaned(1L) == original(1L))
    // doc 2 loses the shared interior segments: strictly shorter, and
    // every removed char is part of the passage (prefix+suffix intact)
    assert(cleaned(2L).length < original(2L).length)
    assert(cleaned(2L).startsWith(filler(32, 17)))
    assert(cleaned(2L).endsWith(filler(42, 40)))
    // no duplicated 16+ segment content survives twice corpus-wide:
    // re-running detection on the cleaned corpus finds nothing
    val again = SubstringDedup.spanStats(
      cleaned.toSeq.toDF("doc_id", "text"))
      .agg(sum("dup_segs")).head.getLong(0)
    assert(again == 0L, "cleaned corpus still contains duplicated segments")
  }
}
